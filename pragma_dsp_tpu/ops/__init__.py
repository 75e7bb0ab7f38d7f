"""Performance ops layer: Pallas kernels, MXU FFTs, dispatch, DSP blocks."""

from .channelizer import (
    PfbState,
    pfb_channelize,
    pfb_channelize_step,
    pfb_stream_init,
    pfb_taps,
)
from .demod import (
    FmDemodState,
    am_demod,
    deemphasis,
    fm_discriminate,
    fm_discriminate_step,
    fm_stream_init,
    iir_one_pole,
)
from .conv_pallas import circular_convolve_pallas
from .pfb_pallas import pfb_channelize_pallas
from .dispatch import (fft, get_fft_impl, get_fft_precision, ifft,
                       set_fft_impl, set_fft_precision)
from .fft_fourstep import fft_fourstep, ifft_fourstep
from .fft_pallas import (
    fft_pallas,
    fft_pallas_permuted,
    ifft_pallas,
    ifft_pallas_from_permuted,
    spectrum_amplitude_pallas,
    spectrum_amp_phase_pallas,
    framed_spectrum_amplitude_pallas,
    framed_spectrum_amp_phase_pallas,
    framed_spectrum_supported,
)
from .fir import FirState, fir_filter, fir_step, fir_stream_init, overlap_save_filter
from .rfft import irfft, rfft
from .polyphase import (
    UpfirdnState,
    decimate,
    design_lowpass,
    interpolate,
    resample_poly,
    resampler_taps,
    upfirdn,
    upfirdn_step,
    upfirdn_stream_init,
)

__all__ = [
    "fft",
    "ifft",
    "set_fft_impl",
    "get_fft_impl",
    "set_fft_precision",
    "get_fft_precision",
    "circular_convolve_pallas",
    "pfb_channelize_pallas",
    "fft_fourstep",
    "rfft",
    "irfft",
    "ifft_fourstep",
    "fft_pallas",
    "ifft_pallas",
    "fft_pallas_permuted",
    "ifft_pallas_from_permuted",
    "spectrum_amplitude_pallas",
    "spectrum_amp_phase_pallas",
    "framed_spectrum_amplitude_pallas",
    "framed_spectrum_amp_phase_pallas",
    "framed_spectrum_supported",
    "FirState",
    "fir_filter",
    "fir_step",
    "fir_stream_init",
    "overlap_save_filter",
    "decimate",
    "design_lowpass",
    "interpolate",
    "resample_poly",
    "resampler_taps",
    "upfirdn",
    "UpfirdnState",
    "upfirdn_step",
    "upfirdn_stream_init",
    "FmDemodState",
    "am_demod",
    "deemphasis",
    "fm_discriminate",
    "fm_discriminate_step",
    "fm_stream_init",
    "iir_one_pole",
    "PfbState",
    "pfb_channelize",
    "pfb_channelize_step",
    "pfb_stream_init",
    "pfb_taps",
]
