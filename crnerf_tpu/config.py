"""Experiment configuration.

The reference drives everything through ~50 argparse flags
(``/root/reference/opt.py:5-172``). Here the same surface is a typed dataclass
with *real* booleans (the reference's ``--use_cache``/``--encode_a``/
``--use_mask``/``--encode_random``/``--use_residual`` default to True but are
``action="store_true"`` and can never be disabled — ``opt.py:38-43,84-91``; we
fix that with ``--no-<flag>`` forms) plus TPU-specific knobs (mesh shape,
compute dtype, fixed appearance-input resolution for static shapes).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass
class Config:
    # ---- dataset (opt.py:8-44) ----
    root_dir: str = ""
    dataset_name: str = "phototourism"  # 'blender' | 'phototourism' | 'synthetic'
    scene_name: str = "test"
    split: str = "val"  # val | test | test_train | test_test
    img_downscale: int = 2
    img_wh: Tuple[int, int] = (800, 800)  # blender / test-path renders
    data_perturb: Tuple[str, ...] = ()  # subset of {"color", "occ"}
    use_cache: bool = True
    testit: bool = False  # smoke mode: 1 epoch, 1 iteration per epoch

    # ---- NeRF core (opt.py:46-62) ----
    N_emb_xyz: int = 15
    N_emb_dir: int = 4
    N_samples: int = 64
    N_importance: int = 64
    use_disp: bool = False
    perturb: float = 1.0
    noise_std: float = 1.0
    pertube_cord: bool = False  # reference --pertubeCord (rendering.py:102-104)
    netdepth: int = 8
    netwidth: int = 256
    use_residual: bool = True

    # ---- CR-NeRF head (opt.py:63-94) ----
    encode_a: bool = True
    encode_c: bool = False
    encode_random: bool = True
    use_mask: bool = True
    mse_on_appearance: bool = False
    N_a: int = 48
    N_vocab: int = 1500
    nerf_out_dim: int = 64
    decoder: str = "linearStyle"
    decoder_num_res_blocks: int = 1
    model_mode: str = "1-1"  # '1-1' (NeuralRenderer) | '1-4-1' (tanh variant)
    sigma_dropout_rate: float = 0.0

    # ---- losses (opt.py:96-110) ----
    maskrs_max: float = 5e-2
    maskrs_min: float = 6e-3
    maskrs_k: float = 1e-3
    maskrd: float = 0.0
    weightKL: float = 1e-5
    weightRecA: float = 1e-3
    weightMS: float = 1e-6
    weightcontent: float = 1e-4

    # ---- sampling schedule (opt.py:111-114; phototourism…py:250-253) ----
    scale_anneal: float = -1.0
    min_scale: float = 0.5

    # ---- runtime (opt.py:116-134) ----
    batch_size: int = 1024  # rays per grid; must be a perfect square
    grids_per_step: int = 1  # independent image grids per device per step
    # (vmapped; == the reference's --num_gpus DDP semantics folded onto one
    # chip — feeds the MXU enough points to saturate it)
    chunk: int = 8 * 1024  # eval-time ray tile size (lax.map tile)
    num_epochs: int = 20
    num_devices: int = 0  # 0 = use all local devices (reference --num_gpus)
    save_dir: str = "./results"
    ckpt_path: Optional[str] = None
    auto_resume: bool = False  # resume from the exp dir's latest checkpoint
    # if one exists (preemption recovery without a manual --ckpt_path; the
    # reference's recovery is manual-only — SURVEY.md §5.3)
    prefixes_to_ignore: Tuple[str, ...] = ("loss",)
    exp_name: str = "debug"
    proj_name: str = "crnerf_tpu"
    refresh_every: int = 1

    # ---- optimization (opt.py:136-163) ----
    optimizer: str = "adam"  # sgd | adam | radam | ranger
    lr: float = 5e-4
    momentum: float = 0.9
    weight_decay: float = 0.0
    lr_scheduler: str = "cosine"  # steplr | cosine | poly
    warmup_multiplier: float = 1.0
    warmup_epochs: int = 0
    decay_step: Tuple[int, ...] = (20,)
    decay_gamma: float = 0.1
    poly_exp: float = 0.9

    # ---- TPU-native knobs (no reference equivalent) ----
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16' for MLP matmuls
    # Pallas routing defaults follow the measured-faster option per path
    # (BASELINE.md): since the rays-in fused render kernel (2026-08-17)
    # Pallas wins BOTH paths — inference 0.585 vs 0.777 s/frame XLA at
    # the eval protocol's 256+256 sampling, training +145% vs XLA.
    use_pallas: bool = True  # fused kernel for INFERENCE renders
    pallas_train: bool = True  # fused fwd+bwd MLP in the TRAIN step (TPU)
    pallas_render: bool = True  # fuse alpha-compositing INTO the Pallas
    # kernel (ops/fused_render): per-point features never touch HBM; only
    # per-ray feature map / weights / depth are written. Applies wherever
    # the fused kernels run (pallas_train / use_pallas).
    pallas_interpret: bool = False  # run Pallas routes via the interpreter
    # on CPU (test/CI coverage of the TPU code path)
    pallas_stash: bool = True  # stash-activations backward for the fused
    # render kernel: fwd writes trunk acts (+ encode) at compute_dtype,
    # bwd consumes them instead of recomputing the forward (3x -> ~2.05x
    # fwd FLOPs; bit-identical grads; +25-30% fwd+bwd measured, 60-epoch
    # quality 27.85 dB vs the 27.0-27.3 band). HBM cost ~(L+1.5)*W
    # values/point over one pass's fwd->bwd lifetime — hence the auto
    # chunking below at large G.
    eval_tile_pts: int = 2048  # points-per-tile target for the fused
    # forward at INFERENCE (0 = the kernel's train default, 4096). At
    # eval the 2048-pt tile measured 0.561/0.610 s/frame exact/bucketed
    # vs 0.610/0.672 for 4096 in the same sweep (-8%, XLA control leg
    # flat — BASELINE.md 2026-08-19): eval renders only the forward, so
    # the smaller tile's better VMEM pipelining wins without the
    # backward-stash considerations that pick 4096 for training.
    # CRNERF_FWD_TILE_PTS still overrides both paths for sweeps.
    grad_accum_chunks: int = 0  # split the G grids into this many
    # sequential gradient-accumulation chunks (lax.scan, conv heads
    # hoisted out and batched over all G) — bounds the live stash memory
    # to G/chunks grids; grads/metrics are chunk-means, numerically ==
    # the vmapped step (fp order). 0 = AUTO: with the stash backward on,
    # enough chunks to keep <= 8 grids of stash live (the measured v5e
    # HBM fit at G=16/C=2), else 1.

    hoist_heads: bool = False  # compute enc_a/CGNet outside the chunk
    # scan (batched over all G, grads via vjp cotangents). Numerically ==
    # in-scan heads (tested); measured 141.7k vs 145.8k rays/s at C=2 —
    # the vjp serializes head compute against the scan, so OFF by
    # default; revisit at higher chunk counts.

    fold_heads: bool = False  # run the appearance encoder on each
    # chunk's grids as ONE folded 4-D batch inside the loss instead of
    # vmapped per grid. Identical math (tested), and the FORWARD convs
    # measure at MXU peak in isolation (spike_packed_conv.py) — but the
    # TPU A/B measured 146.5k/151.2k vs 167.6k same-hour vmapped
    # baseline (-10..-13%): the folded encoder's BACKWARD (wgrad over
    # the big batch + the fold's vjp transposes) costs far more than
    # the vmapped heads' entire fwd+bwd. Seventh recorded conv-head
    # rejection (BASELINE.md 2026-08-19 evening); OFF by default.
    # With hoist_heads=True the fold moves into the hoisted vjp instead
    # (train/step.py heads_fn): enc_a traced non-vmapped on the folded
    # 4-D batch OUTSIDE the chunk scan, so both directions lower to the
    # plain emitter-peak conv forms — the combination the two single-knob
    # rejections never measured.

    def resolved_chunks(self) -> int:
        if self.grad_accum_chunks > 0:
            return self.grad_accum_chunks
        if self.pallas_stash and self.grids_per_step >= 8:
            g = self.grids_per_step
            # smallest chunk count that divides G and keeps <= 8 grids
            # of stash live per chunk; 2 floor (the measured G=16 fit).
            # Chunking requires C | G (train/step.py), so search divisors —
            # but cap the serialization: a G whose only divisor in range is
            # far above the <=8-live intent (e.g. prime G=17 -> C=17, one
            # grid per chunk) would silently serialize the whole scan.
            lo = max(2, -(-g // 8))
            for c in range(lo, min(g, 4 * lo) + 1):
                if g % c == 0:
                    return c
            # No divisor near the <=8-live target: fall back to the
            # smallest divisor >= lo (HBM-safe; worst case C=G fully
            # serializes the scan but never keeps >8 grids' stash live
            # — the opposite failure, C=1, can OOM at G>=16 per the
            # measured stash HBM math in ops/fused_render.py).
            for c in range(lo, g + 1):
                if g % c == 0:
                    import warnings

                    warnings.warn(
                        f"grids_per_step={g} has no divisor in "
                        f"[{lo}, {4 * lo}]; AUTO grad_accum_chunks uses "
                        f"{c} (serialized but HBM-safe). Set "
                        "grad_accum_chunks explicitly or pick G with a "
                        "divisor near ceil(G/8).", stacklevel=2,
                    )
                    return c
        return 1
    s2d_heads: bool = False  # space-to-depth schedule for the appearance
    # encoder's wide 3x3 convs (identical math/params; MXU-utilization
    # experiment — models/common.py s2d_conv3x3)
    s2d_stack: bool = False  # WHOLE-STACK space-to-depth appearance
    # encoder: pack once per pyramid level, convs + halos stay packed,
    # maxpools unpack free as cross-phase maxes (models/appearance.py)
    # — removes the per-conv repack traffic that sank s2d_heads
    pdf_impl: str = "onehot"  # sample_pdf gather realization: 'onehot'
    # (MXU contractions) or 'maskreduce' (fused masked reduces, no HBM
    # one-hot operands — core/sampling.py; identical values, A/B on TPU)
    chunk_unroll: bool = False  # unroll the grad-accum chunk scan so XLA
    # can overlap one chunk's flat tail with the next chunk's kernels
    # (same math; compile time rises with chunks — A/B on TPU)
    fast_sincos: bool = True  # double-angle recurrence for the posenc
    # sin/cos sweep on the fused bf16 path (~F x fewer transcendentals;
    # error ~2^F * 1e-7 ~= 1.6e-3 at F=15, below bf16 quantization).
    # Only consulted when compute_dtype == 'bfloat16'; fp32 always exact.
    mesh_shape: Tuple[int, ...] = ()  # () = 1D data mesh over all devices
    appearance_wh: Tuple[int, int] = (224, 160)  # fixed (W, H) of whole-image
    # appearance/mask inputs: the reference feeds variable downscale-8 images
    # (phototourism…py:36-39,194-196); we resize to one static shape so the
    # whole train step stays a single XLA program.
    remat: bool = True  # jax.checkpoint the MLP eval (HBM <-> FLOPs trade)
    val_chunk: int = 2048  # reference forces chunk 2048 in val (train…py:180)
    eval_bucket: bool = True  # pad full-image renders to quarter-octave
    # ray buckets (<= 25% pad waste) with masked decode stats
    # (render/inference.py): any number of image sizes within a 2x pixel
    # band costs at most four cached compiles instead of a 5-10 min TPU
    # compile per distinct (h, w). --no-eval_bucket for the exact
    # per-resolution path.
    cam_rays: bool = True  # eval/video/serve frames ship (c2w, K, near,
    # far) and generate rays + uv inside the bucketed program
    # (render/inference.py _fn_bucketed_cam) instead of staging a
    # (h*w, 8) host ray buffer (~20 MB/frame at the largest buckets over
    # the TPU tunnel). --no-cam_rays restores host ray generation.
    eval_pipeline: int = 2  # frames kept in flight by the eval/video
    # apps (render/inference.py render_frame_async): dispatch frame i+1
    # before fetching frame i so device compute overlaps the host fetch.
    # On the tunneled TPU the per-frame fetch dominates production eval
    # wall-clock (results/REHEARSAL.md); paired with the on-device uint8
    # quantization (~20x smaller fetch) this makes full-split rendering
    # compute-bound. 1 = synchronous (identical outputs either way).
    log_every: int = 50
    use_wandb: bool = False  # attach wandb to the MetricLogger when the
    # package is importable (reference WandbLogger, train…py:433-439);
    # JSONL stays on either way
    img_panel_every: int = 5000  # train-time gt/pred/random/mask panels
    # every N steps (reference train…py:299-335); 0 disables
    ckpt_every_epochs: int = 1
    seed: int = 42
    donate_state: bool = True
    steps_per_dispatch: int = 0  # > 1: the Trainer feeds the device in
    # SLABS of this many steps via one jitted lax.scan per slab instead of
    # one dispatch per step. Identical math and batch stream (the sampler
    # is a pure f(epoch, step)); host-side dispatch/fetch overhead is paid
    # once per slab, which is what makes full-rate training possible over
    # high-latency links (the axon tunnel pays ~1-2 s per dispatch —
    # bench.py methodology). Whole appearance images are not staged
    # per-step: the scan body gathers them on device from the resident
    # appearance stack. 0/1 = per-step feeding (panels/profile hooks are
    # per-step-path features and are skipped in slab mode).
    slab_data: str = "auto"  # slab-mode batch staging. 'host' ships the
    # full (rays, ts, rgbs) arrays per step (~48 KB/grid -> ~100 MB per
    # 125-step G=16 slab over the tunnel). 'device' keeps the scene's
    # flat ray/rgb buffers RESIDENT in HBM (48 B/ray) and ships only
    # (ray_idx int32, uv_pix, image_idx) per step (~12 KB/grid, ~8x
    # less); the scan body gathers the rows on device — bitwise-identical
    # batches (a pure gather of the same f32 rows; pinned by
    # tests/test_slab_gather.py). 'auto' = 'device' when the buffers fit
    # slab_buf_gb, else 'host' (Brandenburg ds2 is ~18 GB of rays — the
    # resident mode is a fit question, not a correctness one).
    slab_buf_gb: float = 6.0  # resident ray/rgb budget for slab_data=auto
    val_every_epochs: int = 1  # run the epoch-end validation render every
    # N epochs (reference: every epoch, train…py:340-417). 0 disables
    # validation entirely (throughput A/B runs); the last epoch always
    # validates when enabled.
    norm: str = "batch"  # CGNet norm: 'batch' (reference fidelity) | 'group'
    video_format: str = "gif"  # gif | mp4 (reference eval.py:301-304)
    num_frames: int = 0  # camera-path frame count override for
    # --split test; 0 = the per-scene preset's count (240)
    profile: bool = False  # capture an XLA/Perfetto trace of train steps
    profile_steps: Tuple[int, int] = (10, 15)  # [start, stop) global steps

    # ------------------------------------------------------------------
    @property
    def grid_hw(self) -> int:
        """Side of the sampled pixel grid (reference: sqrt(batch_size) —
        phototourism…py:248, H=W=sqrt(num_rays) train…py:279-280)."""
        side = int(round(self.batch_size ** 0.5))
        if side * side != self.batch_size:
            raise ValueError(
                f"batch_size must be a perfect square (got {self.batch_size})"
            )
        return side

    @property
    def in_channels_xyz(self) -> int:
        return 6 * self.N_emb_xyz + 3  # 93 for N_emb_xyz=15

    @property
    def in_channels_dir(self) -> int:
        return 6 * self.N_emb_dir + 3  # 27 for N_emb_dir=4

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        f = {x.name for x in dataclasses.fields(Config)}
        clean = {}
        for k, v in d.items():
            if k in f:
                clean[k] = tuple(v) if isinstance(v, list) else v
        return Config(**clean)


# Boolean flags are detected from the dataclass default's type (every
# bool gets a paired --flag / --no-flag); a hand-maintained name set
# silently dropped new fields (cam_rays shipped without its CLI switch).
_BOOL_FIELDS = {
    f.name for f in dataclasses.fields(Config)
    if isinstance(getattr(Config(), f.name), bool)
}


def build_parser(defaults: Optional[Config] = None) -> argparse.ArgumentParser:
    """Argparse mirror of the dataclass. Booleans get paired
    ``--flag`` / ``--no-flag`` switches."""
    cfg = defaults or Config()
    p = argparse.ArgumentParser(description="CR-NeRF on TPU")
    for f in dataclasses.fields(Config):
        name = f.name
        default = getattr(cfg, name)
        arg = "--" + name
        if name in _BOOL_FIELDS:
            group = p.add_mutually_exclusive_group()
            group.add_argument(arg, dest=name, action="store_true",
                               default=default)
            group.add_argument("--no-" + name, dest=name, action="store_false")
        elif isinstance(default, tuple):
            elt = type(default[0]) if default else str
            p.add_argument(arg, nargs="*", type=elt, default=list(default))
        elif default is None:
            p.add_argument(arg, type=str, default=None)
        else:
            p.add_argument(arg, type=type(default), default=default)
    return p


def get_config(argv: Optional[Sequence[str]] = None) -> Config:
    """Parse CLI args into a Config (reference: ``get_opts()``, opt.py:5)."""
    args = build_parser().parse_args(argv)
    d = vars(args)
    for f in dataclasses.fields(Config):
        if isinstance(getattr(Config(), f.name, None), tuple) and isinstance(
            d.get(f.name), list
        ):
            d[f.name] = tuple(d[f.name])
    cfg = Config(**d)
    if cfg.testit:
        cfg = cfg.replace(num_epochs=1)  # reference train…py:483-484
    return cfg
