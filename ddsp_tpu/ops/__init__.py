"""Pure-jnp DSP ops: the compute core of ddsp_tpu.

Flat namespace mirroring the reference's `ddsp.core` + `ddsp.spectral_ops`
surface (see SURVEY.md section 2.1), so `from ddsp_tpu import ops;
ops.oscillator_bank(...)` works for everything.
"""

# pylint: disable=wildcard-import,g-importing-member
from ddsp_tpu.ops.core import *  # noqa: F401,F403
from ddsp_tpu.ops.resample import center_crop  # noqa: F401
from ddsp_tpu.ops.resample import resample  # noqa: F401
from ddsp_tpu.ops.resample import upsample_with_windows  # noqa: F401
from ddsp_tpu.ops.oscillator import angular_cumsum  # noqa: F401
from ddsp_tpu.ops.oscillator import get_harmonic_frequencies  # noqa: F401
from ddsp_tpu.ops.oscillator import harmonic_oscillator_bank  # noqa: F401
from ddsp_tpu.ops.oscillator import harmonic_synthesis  # noqa: F401
from ddsp_tpu.ops.oscillator import normalize_harmonics  # noqa: F401
from ddsp_tpu.ops.oscillator import oscillator_bank  # noqa: F401
from ddsp_tpu.ops.oscillator import remove_above_nyquist  # noqa: F401
from ddsp_tpu.ops.oscillator import streaming_harmonic_synthesis  # noqa: F401
from ddsp_tpu.ops.synth_convert import harmonic_to_sinusoidal  # noqa: F401
from ddsp_tpu.ops.synth_convert import sinusoidal_to_harmonic  # noqa: F401
from ddsp_tpu.ops.wavetable import harmonic_distribution_to_wavetable  # noqa: F401
from ddsp_tpu.ops.wavetable import linear_lookup  # noqa: F401
from ddsp_tpu.ops.wavetable import variable_length_delay  # noqa: F401
from ddsp_tpu.ops.wavetable import wavetable_synthesis  # noqa: F401
from ddsp_tpu.ops.fftconv import apply_window_to_impulse_response  # noqa: F401
from ddsp_tpu.ops.fftconv import crop_and_compensate_delay  # noqa: F401
from ddsp_tpu.ops.fftconv import fft_convolve  # noqa: F401
from ddsp_tpu.ops.fftconv import frame  # noqa: F401
from ddsp_tpu.ops.fftconv import frequency_filter  # noqa: F401
from ddsp_tpu.ops.fftconv import frequency_impulse_response  # noqa: F401
from ddsp_tpu.ops.fftconv import get_fft_size  # noqa: F401
from ddsp_tpu.ops.fftconv import overlap_and_add  # noqa: F401
from ddsp_tpu.ops.fftconv import sinc  # noqa: F401
from ddsp_tpu.ops.fftconv import sinc_filter  # noqa: F401
from ddsp_tpu.ops.fftconv import sinc_impulse_response  # noqa: F401
from ddsp_tpu.ops import spectral  # noqa: F401
from ddsp_tpu.ops.spectral import compute_loudness  # noqa: F401
from ddsp_tpu.ops.spectral import compute_logmag  # noqa: F401
from ddsp_tpu.ops.spectral import compute_logmel  # noqa: F401
from ddsp_tpu.ops.spectral import compute_mag  # noqa: F401
from ddsp_tpu.ops.spectral import compute_mel  # noqa: F401
from ddsp_tpu.ops.spectral import compute_mfcc  # noqa: F401
from ddsp_tpu.ops.spectral import compute_power  # noqa: F401
from ddsp_tpu.ops.spectral import compute_rms_energy  # noqa: F401
from ddsp_tpu.ops.spectral import get_framed_lengths  # noqa: F401
from ddsp_tpu.ops.spectral import pad_or_trim_to_expected_length  # noqa: F401
from ddsp_tpu.ops.spectral import stft  # noqa: F401
from ddsp_tpu.ops import crepe  # noqa: F401,E402
from ddsp_tpu.ops import hmm  # noqa: F401,E402
from ddsp_tpu.ops.crepe import CrepeModel  # noqa: F401,E402
from ddsp_tpu.ops.crepe import PretrainedCrepe  # noqa: F401,E402
from ddsp_tpu.ops.spectral import compute_f0  # noqa: F401,E402
from ddsp_tpu.ops.spectral import reset_crepe  # noqa: F401,E402
from ddsp_tpu.ops.spectral import stft_np  # noqa: F401,E402
