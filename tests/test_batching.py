"""ops.batching unit tests."""

import numpy as np

from vimoclip_tpu.ops.batching import (
    embed_in_fixed_batches,
    pad_to_batch,
    round_up_bucket,
)


def test_round_up_bucket():
    assert round_up_bucket(5, 8) == 8
    assert round_up_bucket(8, 8) == 8
    assert round_up_bucket(9, 8, cap=12) == 12
    assert round_up_bucket(9, None) == 9
    assert round_up_bucket(9, None, cap=4) == 4


def test_pad_to_batch():
    x = np.ones((3, 2), np.float32)
    out = pad_to_batch(x, 5)
    assert out.shape == (5, 2)
    np.testing.assert_array_equal(out[3:], 0)
    assert pad_to_batch(x, 3) is x


def test_embed_in_fixed_batches():
    calls = []

    def fake_embed(x):
        calls.append(np.asarray(x).shape)
        return np.asarray(x).sum(axis=(1, 2))[:, None] * np.ones((1, 4))

    frames = np.arange(10 * 2 * 3, dtype=np.float32).reshape(10, 2, 3)
    out = embed_in_fixed_batches(fake_embed, frames, batch_size=4, out_dim=4)
    assert out.shape == (10, 4)
    assert calls == [(4, 2, 3)] * 3  # one compiled shape, tail padded
    np.testing.assert_allclose(out[:, 0], frames.sum(axis=(1, 2)))
    empty = embed_in_fixed_batches(fake_embed, frames[:0], 4, 4)
    assert empty.shape == (0, 4)
