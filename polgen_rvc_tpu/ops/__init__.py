"""Pure jittable ops with PyTorch-compatible semantics.

The RVC checkpoint families were trained with torch layers; bitwise-faithful
re-implementation of their shape/padding semantics is the #1 fidelity risk
(SURVEY.md §7 "hard parts"). Every op here is parity-tested against torch CPU
in tests/test_ops_*.py.
"""

from .conv import conv1d, conv2d, conv_transpose1d, conv_transpose2d
from .audio import (
    frame_signal,
    hann_window,
    stft_magnitude,
    mel_filterbank,
    log_mel_spectrogram,
)
from .rnn import gru, bigru
from .resample import resample
from .filters import butter_highpass, highpass_filtfilt, filtfilt_jax, sosfilt
from .f0_utils import (
    pitch_shift,
    coarse_f0,
    bin_cents_table,
    cents_to_hz,
    local_average_cents,
    salience_to_f0,
)
