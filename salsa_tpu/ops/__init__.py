"""TPU-tuned primitive ops shared across the model zoo."""
from salsa_tpu.ops.dropout import dropout, FastDropout

__all__ = ["dropout", "FastDropout"]
