from salsa_tpu.utils.config import AttrDict, load_config  # noqa: F401
