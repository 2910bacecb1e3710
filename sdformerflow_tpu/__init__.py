"""sdformerflow_tpu — TPU-native (JAX/XLA/Pallas) framework for event-camera
optical flow estimation with spatiotemporal Swin transformers.

Re-designed from scratch for TPU hardware with the capabilities of the
SDformerFlow reference (yitian97/SDformerFlow):

- STTFlowNet: ANN spatiotemporal Swin-3D encoder + multi-res conv U-Net decoder.
- SDformerFlow: fully spiking Swin-3D encoder (LIF/PSN/GLIF neurons with
  surrogate gradients through ``jax.lax.scan``) + spiking conv decoder.

Design notes (TPU-first, not a torch translation):
- All features are time-major, channels-last ``[T, B, H, W, C]`` internally;
  convolutions run on the flattened ``(T*B)`` batch so the MXU sees one large
  batched conv per layer instead of a Python loop over timesteps.
- Neuron recurrences are ``lax.scan`` bodies compiled into the same XLA
  program as the surrounding convs (the reference needs SpikingJelly's CuPy
  kernels for this; here XLA fuses it for free).
- Event->voxel rasterization runs on-device as an XLA scatter-add
  (``ops.voxel``), replacing the reference's offline CPU preprocessing pass.
- Data parallelism is a ``jax.sharding.Mesh`` + sharded batch; gradient
  all-reduce is emitted by XLA from sharding specs (no DataParallel).
"""

__version__ = "0.1.0"
