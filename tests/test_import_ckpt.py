"""Reference-checkpoint importer tests.

Builds the ACTUAL reference torch modules (seeded), assembles a Lightning-
style checkpoint with the NeRFSystem prefixes (train_mask_grid_sample.py:
76-115), runs scripts/import_torch_ckpt.py's converter, and asserts:

1. the key-based converter's trees are BIT-IDENTICAL to the module-object
   ports proven numerically correct in tests/test_parity.py;
2. the imported tree structure matches CrNerfSystem.init exactly, so the
   eval/video apps consume the bundle directly;
3. the npz round-trip through the CLI works and the system forward runs.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_parity import (  # noqa: E402  (reference import shims live there)
    RefArgs,
    port_cgnet,
    port_encoder,
    port_mullayer,
    port_nerf_sigma,
    t2n,
)

from crnerf_tpu.utils.torch_port import convert_state_dict  # noqa: E402

# The shipped nerf_out_dim. Must be 64 here: reference MulLayer builds
# CNN(matrixSize) WITHOUT forwarding in_channel (linearStyleTransfer.py:46-47)
# so cnet/snet conv1 always expect 64 input channels — at any other
# nerf_out_dim the reference module cannot run forward, hence no real
# checkpoint can exist at other widths.
OUT_DIM = 64


def _build_reference_system():
    """All six submodules of the reference NeRFSystem, seeded."""
    from models.lightweight_seg import Context_Guided_Network
    from models.linearStyleTransfer import (
        encoder_sameoutputsize,
        style_net,
    )
    from models.nerf import NeRF_sigma

    torch.manual_seed(123)
    mods = {
        "nerf_coarse": NeRF_sigma(
            "coarse", RefArgs(nerf_out_dim=OUT_DIM),
            in_channels_xyz=93, in_channels_dir=27,
        ),
        "nerf_fine": NeRF_sigma(
            "fine", RefArgs(nerf_out_dim=OUT_DIM),
            in_channels_xyz=93, in_channels_dir=27,
        ),
        "enc_a": encoder_sameoutputsize(out_channel=OUT_DIM),
        "enc_cont": encoder_sameoutputsize(out_channel=OUT_DIM),
        "decoder": style_net(
            RefArgs(nerf_out_dim=OUT_DIM, img_wh=(32, 32))
        ),
        "implicit_mask": Context_Guided_Network(
            classes=1, M=2, N=2, input_channel=3
        ),
    }
    with torch.no_grad():  # non-trivial BN running stats
        for m in mods["implicit_mask"].modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    return mods


def _lightning_state_dict(mods):
    sd = {}
    for prefix, m in mods.items():
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    # the reference ckpt also carries loss-module buffers that load_ckpt
    # skips via prefixes_to_ignore (utils/__init__.py:84-88)
    sd["loss.dummy"] = torch.zeros(1)
    return sd


def _assert_tree_equal(a, b, path=""):
    assert sorted(a) == sorted(b), (path, sorted(a), sorted(b))
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}"
            )


class TestConverterMatchesModulePorts:
    def test_bit_identical_to_parity_ports(self):
        mods = _build_reference_system()
        sd = _lightning_state_dict(mods)
        params, stats = convert_state_dict(sd)

        assert sorted(params) == [
            "dec" + "oder", "enc_a", "enc_cont", "implicit_mask",
            "nerf_coarse", "nerf_fine",
        ]
        _assert_tree_equal(
            params["nerf_coarse"], port_nerf_sigma(mods["nerf_coarse"])
        )
        _assert_tree_equal(
            params["nerf_fine"], port_nerf_sigma(mods["nerf_fine"])
        )
        _assert_tree_equal(params["enc_a"], port_encoder(mods["enc_a"]))
        _assert_tree_equal(
            params["enc_cont"], port_encoder(mods["enc_cont"])
        )
        ref_dec = {
            "multi_net": port_mullayer(mods["decoder"].multi_net),
            "decoder": {
                "feat_2_rgb_0": {
                    "kernel": t2n(
                        mods["decoder"].decoder.feat_2_rgb_list[0].weight
                    ).transpose(2, 3, 1, 0),
                    "bias": t2n(
                        mods["decoder"].decoder.feat_2_rgb_list[0].bias
                    ),
                }
            },
        }
        _assert_tree_equal(params["decoder"], ref_dec)
        ref_mask_p, ref_mask_s = port_cgnet(mods["implicit_mask"])
        _assert_tree_equal(params["implicit_mask"], ref_mask_p)
        _assert_tree_equal(stats["implicit_mask"], ref_mask_s)

    def test_unknown_prefix_fails_loud(self):
        with pytest.raises(ValueError, match="unknown checkpoint prefix"):
            convert_state_dict({"mystery.weight": torch.zeros(2)})

    def test_decoder_upsample_blocks_map(self):
        """n_blocks>0 NeuralRenderer checkpoints (img > featmap configs,
        nerf_decoder_stylenerf.py:239-260) map onto the flax upsample
        path with matching shapes; Blur '.f' buffers are dropped."""
        import jax

        from crnerf_tpu.models.decoder import NeuralRenderer
        from crnerf_tpu.utils.torch_port import map_neural_renderer

        sys.path.insert(0, "/root/reference")
        from models.nerf_decoder_stylenerf import (
            NeuralRenderer as TorchNR,
        )

        torch.manual_seed(5)
        tm = TorchNR(feat_nc=64, out_dim=3, featmap_size=(8, 8),
                     img_size=(32, 32))  # n_blocks = 2
        params = map_neural_renderer(
            {k: v for k, v in tm.state_dict().items()}
        )
        jm = NeuralRenderer(feat_nc=64, out_dim=3, n_blocks=2)
        init_p = jm.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 64))
        )["params"]
        got = jax.tree.map(lambda x: x.shape, params)
        want = jax.tree.map(lambda x: x.shape, init_p)
        assert got == want
        out = jm.apply({"params": params},
                       jnp.zeros((1, 8, 8, 64), jnp.float32))
        assert out.shape == (1, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestEndToEnd:
    def test_npz_roundtrip_matches_system_structure(self, tmp_path):
        """CLI import -> load_weights_only -> tree structure must equal
        CrNerfSystem.init's, and an eval forward must run on the imported
        weights (the day released ckpts are obtainable this is the whole
        render-from-reference-weights path)."""
        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "scripts"),
        )
        import import_torch_ckpt

        from crnerf_tpu.config import Config
        from crnerf_tpu.render.system import CrNerfSystem
        from crnerf_tpu.utils.checkpoint import load_weights_only

        mods = _build_reference_system()
        ckpt_path = str(tmp_path / "last.ckpt")
        torch.save(
            {"state_dict": _lightning_state_dict(mods), "epoch": 19},
            ckpt_path,
        )
        out = str(tmp_path / "weights.npz")
        import_torch_ckpt.main(["--ckpt", ckpt_path, "--out", out])

        v = load_weights_only(out)
        cfg = Config(
            nerf_out_dim=OUT_DIM, encode_a=True, encode_c=True,
            use_mask=True, encode_random=True, batch_size=16,
            N_samples=4, N_importance=4, appearance_wh=(32, 24),
            N_vocab=8,
        )
        system = CrNerfSystem(cfg)
        init_v = system.init(jax.random.PRNGKey(0))

        # identical pytree structure (leaf paths AND shapes)
        ref_shapes = jax.tree.map(lambda x: x.shape, init_v["params"])
        got_shapes = jax.tree.map(lambda x: x.shape, v["params"])
        assert ref_shapes == got_shapes
        assert jax.tree.map(
            lambda x: x.shape, init_v["batch_stats"]
        ) == jax.tree.map(lambda x: x.shape, v["batch_stats"])

        # eval-style forward on the imported weights
        rng = np.random.RandomState(0)
        d = rng.randn(16, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        batch = {
            "rays": jnp.asarray(np.concatenate(
                [rng.randn(16, 3), d, np.full((16, 1), 0.5),
                 np.full((16, 1), 4.0)], -1
            ), jnp.float32),
            "whole_img": jnp.asarray(
                rng.uniform(-1, 1, (1, 24, 32, 3)), jnp.float32
            ),
        }
        results, _ = system.forward(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            batch, jax.random.PRNGKey(1), train=False, image_hw=(4, 4),
        )
        rgb = np.asarray(results["rgb_fine"])
        assert rgb.shape == (16, 3)
        assert np.isfinite(rgb).all()
