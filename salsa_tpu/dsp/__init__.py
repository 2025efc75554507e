from salsa_tpu.dsp.stft import (  # noqa: F401
    hann_window,
    frame_signal,
    stft,
    istft_frames,
    power_to_db,
    n_stft_frames,
)
from salsa_tpu.dsp.filterbank import (  # noqa: F401
    mel_filterbank,
    high_freq_compression_matrix,
)
