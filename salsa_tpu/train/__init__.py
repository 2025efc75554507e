from salsa_tpu.train.losses import seld_loss, accdoa_loss, masked_reg_loss, bce_with_logits  # noqa: F401
from salsa_tpu.train.schedules import piecewise_linear_interp  # noqa: F401
from salsa_tpu.train.submission import combine_chunks, write_classwise_csv, sed_from_accdoa  # noqa: F401
