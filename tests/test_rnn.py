"""LSTM / GRU / RNN conformance vs torch (which matches ONNX defaults for
gate math; gate ORDER differs — ONNX iofc/zrh vs torch ifgo/rzn — so weights
are permuted accordingly when building the ONNX node)."""

import numpy as np
import pytest

from util import run_op

torch = pytest.importorskip("torch")

rng = np.random.default_rng(71)
T, B, I, H = 5, 3, 4, 6


def f32(*shape):
    return (rng.standard_normal(shape) * 0.5).astype(np.float32)


def _torch_lstm_weights():
    """torch LSTM weights (gate order i f g o) -> ONNX LSTM (i o f c)."""
    m = torch.nn.LSTM(I, H, batch_first=False)
    w_ih = m.weight_ih_l0.detach().numpy()  # [4H, I] (ifgo)
    w_hh = m.weight_hh_l0.detach().numpy()
    b_ih = m.bias_ih_l0.detach().numpy()
    b_hh = m.bias_hh_l0.detach().numpy()

    def to_onnx(w):  # ifgo -> iofc
        i, f, g, o = np.split(w, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)

    W = to_onnx(w_ih)[None]       # [1, 4H, I]
    R = to_onnx(w_hh)[None]
    Bb = np.concatenate([to_onnx(b_ih), to_onnx(b_hh)])[None]  # [1, 8H]
    return m, W, R, Bb


def test_lstm_vs_torch():
    m, W, R, Bb = _torch_lstm_weights()
    x = f32(T, B, I)
    got_y, got_h, got_c = run_op(
        "LSTM", {"x": x}, {"W": W, "R": R, "B": Bb},
        hidden_size=H, direction="forward", n_outputs=3)
    want_y, (want_h, want_c) = m(torch.from_numpy(x))
    np.testing.assert_allclose(got_y[:, 0], want_y.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_h[0], want_h.detach().numpy()[0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_c[0], want_c.detach().numpy()[0],
                               rtol=1e-4, atol=1e-5)


def test_lstm_bidirectional_initial_state():
    m = torch.nn.LSTM(I, H, batch_first=False, bidirectional=True)

    def to_onnx(w):
        i, f, g, o = np.split(w, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)

    W = np.stack([to_onnx(m.weight_ih_l0.detach().numpy()),
                  to_onnx(m.weight_ih_l0_reverse.detach().numpy())])
    R = np.stack([to_onnx(m.weight_hh_l0.detach().numpy()),
                  to_onnx(m.weight_hh_l0_reverse.detach().numpy())])
    Bb = np.stack([
        np.concatenate([to_onnx(m.bias_ih_l0.detach().numpy()),
                        to_onnx(m.bias_hh_l0.detach().numpy())]),
        np.concatenate([to_onnx(m.bias_ih_l0_reverse.detach().numpy()),
                        to_onnx(m.bias_hh_l0_reverse.detach().numpy())])])
    x = f32(T, B, I)
    h0 = f32(2, B, H)
    c0 = f32(2, B, H)
    sl = np.full((B,), T, np.int32)
    got_y, got_h, got_c = run_op(
        "LSTM", {"x": x},
        {"W": W, "R": R, "B": Bb, "sl": sl, "h0": h0, "c0": c0},
        hidden_size=H, direction="bidirectional", n_outputs=3)
    want_y, (want_h, want_c) = m(torch.from_numpy(x),
                                 (torch.from_numpy(h0), torch.from_numpy(c0)))
    want_y = want_y.detach().numpy().reshape(T, B, 2, H).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got_y, want_y, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_h, want_h.detach().numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(got_c, want_c.detach().numpy(), rtol=1e-4,
                               atol=1e-5)


def test_gru_vs_torch():
    m = torch.nn.GRU(I, H)  # torch gate order r z n; ONNX: z r h
    w_ih = m.weight_ih_l0.detach().numpy()
    w_hh = m.weight_hh_l0.detach().numpy()
    b_ih = m.bias_ih_l0.detach().numpy()
    b_hh = m.bias_hh_l0.detach().numpy()

    def to_onnx(w):  # rzn -> zrh
        r, z, n = np.split(w, 3, axis=0)
        return np.concatenate([z, r, n], axis=0)

    W = to_onnx(w_ih)[None]
    R = to_onnx(w_hh)[None]
    Bb = np.concatenate([to_onnx(b_ih), to_onnx(b_hh)])[None]
    x = f32(T, B, I)
    # torch GRU uses linear_before_reset=1 semantics
    got_y, got_h = run_op("GRU", {"x": x}, {"W": W, "R": R, "B": Bb},
                          hidden_size=H, linear_before_reset=1, n_outputs=2)
    want_y, want_h = m(torch.from_numpy(x))
    np.testing.assert_allclose(got_y[:, 0], want_y.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_h[0], want_h.detach().numpy()[0],
                               rtol=1e-4, atol=1e-5)


def test_rnn_vs_torch():
    m = torch.nn.RNN(I, H)
    W = m.weight_ih_l0.detach().numpy()[None]
    R = m.weight_hh_l0.detach().numpy()[None]
    Bb = np.concatenate([m.bias_ih_l0.detach().numpy(),
                         m.bias_hh_l0.detach().numpy()])[None]
    x = f32(T, B, I)
    got_y, got_h = run_op("RNN", {"x": x}, {"W": W, "R": R, "B": Bb},
                          hidden_size=H, n_outputs=2)
    want_y, want_h = m(torch.from_numpy(x))
    np.testing.assert_allclose(got_y[:, 0], want_y.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_lstm_sequence_lens_freeze():
    _, W, R, Bb = _torch_lstm_weights()
    x = f32(T, B, I)
    sl = np.array([5, 3, 2], np.int32)
    got_y, got_h, got_c = run_op(
        "LSTM", {"x": x}, {"W": W, "R": R, "B": Bb, "sl": sl},
        hidden_size=H, n_outputs=3)
    # Y frames past each length are zero
    assert np.all(got_y[3:, 0, 1] == 0) and np.all(got_y[2:, 0, 2] == 0)
    # final state equals the state at t = len-1
    got_y2, got_h2, _ = run_op(
        "LSTM", {"x": x[:2]}, {"W": W, "R": R, "B": Bb}, hidden_size=H,
        n_outputs=3)
    np.testing.assert_allclose(got_h[0, 2], got_y2[1, 0, 2], rtol=1e-5,
                               atol=1e-6)


def test_gru_layout1():
    m = torch.nn.GRU(I, H, batch_first=True)

    def to_onnx(w):
        r, z, n = np.split(w, 3, axis=0)
        return np.concatenate([z, r, n], axis=0)

    W = to_onnx(m.weight_ih_l0.detach().numpy())[None]
    R = to_onnx(m.weight_hh_l0.detach().numpy())[None]
    Bb = np.concatenate([to_onnx(m.bias_ih_l0.detach().numpy()),
                         to_onnx(m.bias_hh_l0.detach().numpy())])[None]
    x = f32(B, T, I)
    got_y, got_h = run_op("GRU", {"x": x}, {"W": W, "R": R, "B": Bb},
                          hidden_size=H, linear_before_reset=1, layout=1,
                          n_outputs=2)
    want_y, want_h = m(torch.from_numpy(x))
    np.testing.assert_allclose(got_y[:, :, 0], want_y.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_rnn_reverse_with_sequence_lens():
    """Reverse direction + per-batch lengths: each sequence's VALID prefix is
    processed back-to-front; padding frames are never consumed."""
    m = torch.nn.RNN(I, H)
    W = m.weight_ih_l0.detach().numpy()[None]
    R = m.weight_hh_l0.detach().numpy()[None]
    Bb = np.concatenate([m.bias_ih_l0.detach().numpy(),
                         m.bias_hh_l0.detach().numpy()])[None]
    x = f32(T, B, I)
    sl = np.array([T, 3, 2], np.int32)
    got_y, got_h = run_op("RNN", {"x": x}, {"W": W, "R": R, "B": Bb, "sl": sl},
                          hidden_size=H, direction="reverse", n_outputs=2)
    # torch reference per sequence: run on the reversed valid prefix
    for b in range(B):
        L = sl[b]
        xr = np.ascontiguousarray(x[:L, b:b + 1][::-1])
        want_y, want_h = m(torch.from_numpy(xr))
        # our Y holds the un-reversed outputs on [0, L)
        np.testing.assert_allclose(got_y[:L, 0, b],
                                   want_y.detach().numpy()[::-1, 0],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got_h[0, b], want_h.detach().numpy()[0, 0],
                                   rtol=1e-4, atol=1e-5)
        assert np.all(got_y[L:, 0, b] == 0)
