"""RAFT/ptlflow adapter contract tests (reference README.md:81-162 — the
paper's 77.09 mAP uses RAFT flow through this interface).

ptlflow isn't installed here (zero egress), so the contract is pinned with
a tiny offline torch module implementing the same inference interface:
input {"images": (1, 2, 3, H', W') float in [0,1]}, output {"flows":
(1, 1, 2, H', W')}.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vimoclip_tpu.data.video_reader import read_video, write_video  # noqa: E402
from vimoclip_tpu.motion import (  # noqa: E402
    PtlflowAdapter,
    farneback_flow,
    generate_optical_flow_video,
    load_flow_backend,
)


class TinyFlowNet(torch.nn.Module):
    """ptlflow-interface model with deterministic, analytically checkable
    output: flow_x = 8 * mean(second image), flow_y = -8 * mean(first)."""

    def forward(self, inputs):
        images = inputs["images"]  # (1, 2, 3, H, W)
        assert images.dim() == 5 and images.shape[1] == 2 and images.shape[2] == 3
        assert images.shape[3] % 8 == 0 and images.shape[4] % 8 == 0, (
            "adapter must pad to the RAFT /8 geometry"
        )
        assert float(images.max()) <= 1.0 + 1e-6, "images must be [0,1] scaled"
        b, _, _, h, w = images.shape
        fx = images[:, 1].mean(dim=1, keepdim=True) * 8.0  # (1, 1, H, W)
        fy = images[:, 0].mean(dim=1, keepdim=True) * -8.0
        return {"flows": torch.stack([fx, fy], dim=2)}  # (1, 1, 2, H, W)


def test_adapter_io_contract():
    """Input prep (BGR->RGB, /255, /8 pad) and output crop are exactly the
    documented contract."""
    adapter = PtlflowAdapter(TinyFlowNet())
    assert adapter.wants_color
    rng = np.random.default_rng(0)
    h, w = 30, 41  # NOT multiples of 8 -> forces the pad/crop path
    prev = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    curr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    flow = adapter(prev, curr)
    assert flow.shape == (h, w, 2)
    assert flow.dtype == np.float32
    # analytic expectation in the unpadded region (channel-mean of RGB ==
    # channel-mean of BGR, so no reversal needed for the oracle)
    exp_x = curr.astype(np.float64).mean(axis=2) / 255.0 * 8.0
    exp_y = prev.astype(np.float64).mean(axis=2) / 255.0 * -8.0
    np.testing.assert_allclose(flow[..., 0], exp_x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(flow[..., 1], exp_y, rtol=1e-5, atol=1e-5)


def test_adapter_rgb_order_matters():
    """BGR->RGB conversion is real: a channel-asymmetric model sees the red
    channel where RGB order puts it."""

    class RedOnly(torch.nn.Module):
        def forward(self, inputs):
            red = inputs["images"][:, :, 0]  # RGB channel 0 == red
            f = red.mean(dim=1, keepdim=True)
            return {"flows": torch.stack([f, f], dim=2)}

    adapter = PtlflowAdapter(RedOnly())
    h, w = 16, 16
    bgr = np.zeros((h, w, 3), np.uint8)
    bgr[..., 2] = 255  # BGR: red channel is index 2
    flow = adapter(bgr, bgr)
    np.testing.assert_allclose(flow, 1.0, atol=1e-6)  # red seen at RGB[0]


def test_load_flow_backend_factory(tmp_path):
    assert load_flow_backend("farneback") is farneback_flow
    with pytest.raises(ValueError):
        load_flow_backend("nope")
    # no ptlflow + no weights -> ImportError surfaces
    with pytest.raises(ImportError):
        load_flow_backend("raft")
    # serialized-module fallback
    weights = str(tmp_path / "tiny_raft.pt")
    torch.save(TinyFlowNet(), weights)
    fn = load_flow_backend("raft", weights=weights)
    assert isinstance(fn, PtlflowAdapter)
    # non-module file is rejected with a clear error
    bad = str(tmp_path / "sd.pt")
    torch.save({"some": torch.zeros(2)}, bad)
    with pytest.raises(TypeError, match="torch module"):
        load_flow_backend("raft", weights=bad)


def test_generate_motion_cli_raft_backend(tmp_path):
    """generate-motion --kind flow --flow-backend raft --flow-weights <file>
    produces a T-1-frame flow video (the VERDICT.md round-1 'done' bar)."""
    from vimoclip_tpu.cli.generate_motion import main

    rng = np.random.default_rng(1)
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    write_video(str(in_dir / "v.mp4"),
                rng.integers(0, 256, (6, 36, 64, 3), dtype=np.uint8))
    (tmp_path / "list.txt").write_text("v.mp4\n")
    weights = str(tmp_path / "tiny_raft.pt")
    torch.save(TinyFlowNet(), weights)

    main([
        "--list-file", str(tmp_path / "list.txt"),
        "--input-dir", str(in_dir), "--output-dir", str(out_dir),
        "--kind", "flow", "--flow-backend", "raft",
        "--flow-weights", weights,
    ])
    out = read_video(str(out_dir / "v.mp4"))
    assert out.shape[0] == 5  # T-1 flow frames
    assert out.shape[1:] == (36, 64, 3)


def test_flow_video_color_vs_gray_paths(tmp_path):
    """The same driver serves gray-input (farneback) and color-input (raft)
    backends; both must produce T-1 frames at source geometry."""
    rng = np.random.default_rng(2)
    src = str(tmp_path / "src.mp4")
    write_video(src, rng.integers(0, 256, (4, 32, 48, 3), dtype=np.uint8))
    n_far = generate_optical_flow_video(src, str(tmp_path / "far.mp4"))
    n_raft = generate_optical_flow_video(
        src, str(tmp_path / "raft.mp4"), flow_fn=PtlflowAdapter(TinyFlowNet())
    )
    assert n_far == n_raft == 3
