"""Pallas TPU kernels.

Strategy: custom kernels are written only where they beat or de-risk XLA's
lowering, not wholesale (the backbone convs already run at ~52% of chip
peak through XLA — see PERF.md — and elementwise chains fuse on their own):

* :mod:`softargmax_kernel` — the full decode chain (softmax -> separable
  Gaussian smoothing -> renormalize -> expectation) fused in VMEM with one
  HBM read per map and a 2-float SMEM write. On par with XLA at
  Precision.HIGHEST in speed and 1000x more accurate than XLA's *default*
  TPU conv precision; guards the decode against global precision flags.
  Opt-in via ``PoseConfig.use_pallas_softargmax``.

Deliberately NOT pallas (measured or reasoned in PERF.md):
* backbone/head convs — XLA at ~52% MXU on v5e, conv microbenchmark ceiling
  ~57%; a hand-written conv would not close a meaningful gap;
* gaussian targets / CE / clique reductions — pure elementwise + reduction
  chains that XLA fuses into the surrounding program (the standalone decode
  measured 48.4 vs 48.5 ms with/without, i.e. free);
* int8 quantized convs — XLA's conv path does not reach the v5e int8 MXU
  rate (measured at bf16 speed), so a quantization kernel would need a full
  custom conv to pay off.
"""

from deepgraphpose_tpu.ops.pallas.softargmax_kernel import softargmax_2d_pallas

__all__ = ["softargmax_2d_pallas"]
