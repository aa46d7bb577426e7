"""CR-NeRF on TPU — a TPU-native JAX/XLA/Pallas framework for novel-view
synthesis from unconstrained photo collections.

Re-implements the full capability surface of CR-NeRF (ICCV 2023,
"Cross-Ray Neural Radiance Fields for Novel-view Synthesis from Unconstrained
Image Collections") as a layered, fixed-shape, jit-first framework:

- ``crnerf_tpu.core``     pure-function render math (rays, posenc, sampling,
                          compositing) — the unit-testable numerical core.
- ``crnerf_tpu.ops``      Pallas TPU kernels for the hot ops, each shipped with
                          a pure-jnp reference implementation.
- ``crnerf_tpu.models``   flax modules: NeRF MLPs, appearance encoder, style
                          transformation, conv decoder, CGNet transient mask.
- ``crnerf_tpu.render``   the jitted volumetric renderer (coarse→fine in one
                          XLA program; lax.map ray tiles instead of host loops).
- ``crnerf_tpu.data``     COLMAP parsing, Phototourism/Blender scenes,
                          grid-sampled ray batching, device-resident buffers.
- ``crnerf_tpu.train``    losses, optax optimizers/schedules, train state
                          (explicit, checkpointable appearance cache), train
                          step, shard_map data parallelism, orbax checkpoints.
- ``crnerf_tpu.eval``     PSNR/SSIM/LPIPS under the reference's right-half
                          protocol.
- ``crnerf_tpu.parallel`` device-mesh / sharding helpers (ICI collectives).
- ``crnerf_tpu.apps``     CLI entry points: prepare | train | eval | metrics |
                          video, mirroring the five reference entry points.

The reference implementation being matched is CR-NeRF-PyTorch
(/root/reference); design notes and the component-by-component parity map live
in SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
