"""pragma_dsp_tpu — a TPU-native DSP/SDR framework (JAX / XLA / Pallas).

Built from scratch with the capabilities of pragma-dsp (see SURVEY.md),
re-designed TPU-first: batched split-complex FFTs, fused windowed-spectrum
ops, Pallas kernels on the hot path, and sharded/streaming pipelines over
device meshes.

The API ladder mirrors the reference (PLAN.md:16-32 of the reference):

* beginner  — ``pragma_dsp_tpu.spectrum`` (root export, like src/index.ts:1)
* power     — ``pragma_dsp_tpu.xform`` (windows, magnitude/phase, shifts)
* expert    — ``pragma_dsp_tpu.core`` (split-complex arrays, FFT plans)
* fluent    — ``pragma_dsp_tpu.fluent`` (chaining with checked inverse)
* streaming — ``pragma_dsp_tpu.stream`` (the Effect-rung analogue)
* scale     — ``pragma_dsp_tpu.parallel`` (meshes, collectives, dist-FFT)
"""

from .public import SpectrumPeak, SpectrumResult, spectrum

__version__ = "0.1.0"

__all__ = ["spectrum", "SpectrumPeak", "SpectrumResult", "__version__"]
