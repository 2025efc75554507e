from salsa_tpu.data.meta import split_filenames  # noqa: F401
from salsa_tpu.data.database import SeldDatabase  # noqa: F401
from salsa_tpu.data.dataset import SeldChunkDataset, batch_iterator  # noqa: F401
from salsa_tpu.data.feature_store import FeatureStore, StreamingScaler  # noqa: F401
