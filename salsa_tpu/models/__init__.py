from salsa_tpu.models.encoders import PannResNet22  # noqa: F401
from salsa_tpu.models.decoders import SeldDecoder  # noqa: F401
from salsa_tpu.models.seld import SeldNet, build_model, interpolate_index_repeat  # noqa: F401
