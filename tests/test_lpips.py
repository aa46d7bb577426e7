"""Certify the LPIPS-alex port numerically WITHOUT pretrained weights.

The pretrained lpips weights are unobtainable offline (eval/lpips.py gates
on them), but the architecture can still be certified: build an independent
torch transcription of the published LPIPS(alex) forward (Zhang et al.,
CVPR 2018; the `lpips` package's scaling -> AlexNet trunk taps ->
unit-normalize -> non-negative 1x1 heads -> spatial mean -> layer sum;
reference consumer: /root/reference/eval_metric.py:63,97-99), give BOTH
sides the same random weights via the npz layout
scripts/export_lpips_weights.py produces, and require equal outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from crnerf_tpu.eval.lpips import LpipsAlex  # noqa: E402

# (out_ch, kernel, stride, pad), pool-after flags — torchvision AlexNet
# `features` config, as sliced by lpips.pretrained_networks.alexnet
_CONVS = [
    (3, 64, 11, 4, 2, True),
    (64, 192, 5, 1, 2, True),
    (192, 384, 3, 1, 1, False),
    (384, 256, 3, 1, 1, False),
    (256, 256, 3, 1, 1, False),
]
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


class _TorchLpipsAlex(nn.Module):
    """Independent transcription of lpips.LPIPS(net='alex') forward."""

    def __init__(self):
        super().__init__()
        self.convs = nn.ModuleList([
            nn.Conv2d(cin, cout, k, s, p)
            for cin, cout, k, s, p, _ in _CONVS
        ])
        self.pool = nn.MaxPool2d(3, 2)
        self.lins = nn.ParameterList([
            nn.Parameter(torch.rand(cout))  # non-negative like lpips
            for _, cout, _, _, _, _ in _CONVS
        ])

    def _taps(self, x01):
        x = x01 * 2 - 1
        x = (x - _SHIFT) / _SCALE
        taps = []
        for i, conv in enumerate(self.convs):
            x = torch.relu(conv(x))
            taps.append(x)
            if _CONVS[i][5]:
                x = self.pool(x)
        return taps

    @staticmethod
    def _normalize(x, eps=1e-10):
        n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
        return x / (n + eps)

    def forward(self, pred01, gt01):
        tp, tg = self._taps(pred01), self._taps(gt01)
        total = 0.0
        for i in range(len(tp)):
            d = (self._normalize(tp[i]) - self._normalize(tg[i])) ** 2
            w = self.lins[i].view(1, -1, 1, 1)
            total = total + (d * w).sum(dim=1).mean(dim=(1, 2))
        return total.mean()


def _export_npz(model, path):
    """Same layout as scripts/export_lpips_weights.py."""
    z = {}
    for i, conv in enumerate(model.convs):
        z[f"conv{i}_w"] = (
            conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        z[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        z[f"lin{i}_w"] = lin.detach().numpy()
    np.savez(path, **z)


class TestLpipsPortParity:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_weight_equivalence(self, tmp_path, seed):
        torch.manual_seed(seed)
        tm = _TorchLpipsAlex()
        path = str(tmp_path / "lpips_alex.npz")
        _export_npz(tm, path)
        jm = LpipsAlex(weights=path)

        rng = np.random.RandomState(seed)
        # 64x64: two pools -> 13x13 maps; NHWC on our side, NCHW torch
        pred = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        gt = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = float(tm(
                torch.from_numpy(pred.transpose(0, 3, 1, 2)),
                torch.from_numpy(gt.transpose(0, 3, 1, 2)),
            ))
        ours = jm(pred, gt)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)

    def test_identical_inputs_score_zero(self, tmp_path):
        torch.manual_seed(2)
        tm = _TorchLpipsAlex()
        path = str(tmp_path / "lpips_alex.npz")
        _export_npz(tm, path)
        jm = LpipsAlex(weights=path)
        img = np.random.RandomState(0).uniform(
            0, 1, (64, 64, 3)
        ).astype(np.float32)
        assert jm(img, img) == pytest.approx(0.0, abs=1e-6)
