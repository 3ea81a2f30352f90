"""Photo2Sketch checkpoint porting: shape-exact tree fill + LSTM numeric
parity through the ported layout."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from art_sbir_tpu.models import torch_port as TP
from art_sbir_tpu.models.layers import TorchLSTMCell
from art_sbir_tpu.models.photo2sketch import Photo2Sketch


def _fake_p2s_state_dict(rng, hidden=32, z=16, m=5):
    sd = {}
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
             (512, 512), (512, 512)]
    for t, (i, o) in zip([0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28], chans):
        he = np.sqrt(2.0 / (9 * i))  # keep activations bounded over 13 layers
        sd[f"Image_Encoder.feature.{t}.weight"] = (
            rng.standard_normal((o, i, 3, 3)).astype(np.float32) * he
        )
        sd[f"Image_Encoder.feature.{t}.bias"] = rng.standard_normal(o).astype(
            np.float32) * 0.01

    def dense(prefix, i, o):
        sd[f"{prefix}.weight"] = rng.standard_normal((o, i)).astype(np.float32) * 0.1
        sd[f"{prefix}.bias"] = rng.standard_normal(o).astype(np.float32) * 0.1

    dense("Image_Encoder.fc_mu", 512, z)
    dense("Image_Encoder.fc_std", 512, z)
    dense("Sketch_Decoder.fc_hc", z, 2 * hidden)
    dense("Sketch_Decoder.fc_params", hidden, 6 * m + 3)
    sd["Sketch_Decoder.lstm.weight_ih_l0"] = rng.standard_normal(
        (4 * hidden, hidden + 5)).astype(np.float32) * 0.1
    sd["Sketch_Decoder.lstm.bias_ih_l0"] = rng.standard_normal(
        4 * hidden).astype(np.float32) * 0.1
    sd["Sketch_Decoder.lstm.weight_hh_l0"] = rng.standard_normal(
        (4 * hidden, hidden)).astype(np.float32) * 0.1
    sd["Sketch_Decoder.lstm.bias_hh_l0"] = rng.standard_normal(
        4 * hidden).astype(np.float32) * 0.1
    dense("Sketch_Decoder.attention_cell.conv_h", hidden, 256)
    sd["Sketch_Decoder.attention_cell.conv_f.weight"] = rng.standard_normal(
        (256, 512, 3, 3)).astype(np.float32) * 0.02
    sd["Sketch_Decoder.attention_cell.conv_f.bias"] = rng.standard_normal(
        256).astype(np.float32) * 0.02
    dense("Sketch_Decoder.attention_cell.conv_att", 256, 1)

    # decoder input size quirk: reference lstm input = att(512) + stroke(5)
    sd["Sketch_Decoder.lstm.weight_ih_l0"] = rng.standard_normal(
        (4 * hidden, 512 + 5)).astype(np.float32) * 0.1
    return sd


def test_port_photo2sketch_tree(rng):
    hidden, z, m = 32, 16, 5
    sd = _fake_p2s_state_dict(rng, hidden, z, m)
    ported = TP.port_photo2sketch(sd, hidden=hidden)

    model = Photo2Sketch(z_size=z, dec_rnn_size=hidden, num_mixture=m,
                         max_seq_len=8)
    img = jnp.zeros((1, 64, 64, 3))
    sketch = jnp.zeros((1, 8, 5))
    vars_ = jax.jit(model.init)(jax.random.key(0), img, sketch, jax.random.key(1))
    merged = TP.merge_into(vars_["params"], ported)
    ref_shapes = {
        "/".join(map(str, p)): np.shape(v)
        for p, v in jax.tree_util.tree_flatten_with_path(vars_["params"])[0]
    }
    new_shapes = {
        "/".join(map(str, p)): np.shape(v)
        for p, v in jax.tree_util.tree_flatten_with_path(merged)[0]
    }
    assert ref_shapes == new_shapes
    params, mu, log_var = jax.jit(model.apply)(
        {"params": merged}, img, sketch, jax.random.key(2)
    )
    assert np.isfinite(np.asarray(params.mu1)).all()


def test_ported_lstm_matches_torch(rng):
    """Port a torch LSTM layer-0 into TorchLSTMCell and compare one step."""
    hidden, inp = 16, 8
    tlstm = torch.nn.LSTM(inp, hidden)
    sd = {
        "Sketch_Decoder.lstm.weight_ih_l0": tlstm.weight_ih_l0.detach().numpy(),
        "Sketch_Decoder.lstm.bias_ih_l0": tlstm.bias_ih_l0.detach().numpy(),
        "Sketch_Decoder.lstm.weight_hh_l0": tlstm.weight_hh_l0.detach().numpy(),
        "Sketch_Decoder.lstm.bias_hh_l0": tlstm.bias_hh_l0.detach().numpy(),
    }
    k = np.float32(1.0 / np.sqrt(hidden))
    lstm_params = {
        "ih_kernel": sd["Sketch_Decoder.lstm.weight_ih_l0"].T + k,
        "ih_bias": sd["Sketch_Decoder.lstm.bias_ih_l0"] + k,
        "hh_kernel": sd["Sketch_Decoder.lstm.weight_hh_l0"].T + k,
        "hh_bias": sd["Sketch_Decoder.lstm.bias_hh_l0"] + k,
    }
    x = rng.standard_normal((3, inp)).astype(np.float32)
    h0 = rng.standard_normal((3, hidden)).astype(np.float32)
    c0 = rng.standard_normal((3, hidden)).astype(np.float32)

    cell = TorchLSTMCell(hidden)
    (h1, c1), _ = cell.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, lstm_params)},
        (jnp.array(h0), jnp.array(c0)), jnp.array(x),
    )
    out, (th, tc) = tlstm(torch.from_numpy(x)[None],
                          (torch.from_numpy(h0)[None], torch.from_numpy(c0)[None]))
    np.testing.assert_allclose(np.asarray(h1), th[0].detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), tc[0].detach().numpy(),
                               rtol=1e-4, atol=1e-5)
