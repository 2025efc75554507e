from salsa_tpu.metrics.dcase_io import (  # noqa: F401
    load_output_csv,
    segment_events,
    polar_deg_to_xyz,
    xyz_to_polar_deg,
    sed_doa_to_event_dict,
    classification_grid_labels,
)
from salsa_tpu.metrics.seld_metrics import (  # noqa: F401
    SeldMetrics2021,
    SeldMetrics2020,
    seld_error_from_scores,
)
