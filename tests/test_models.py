import numpy as np
import pytest
import jax
import jax.numpy as jnp

from salsa_tpu.models.rnn import RNNStack
from salsa_tpu.models.seld import SeldNet, build_model, interpolate_index_repeat
from tests.torch_ref import load_reference_models

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# shapes and registry
# ---------------------------------------------------------------------------

def test_seldnet_shapes(rng):
    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": "bigru", "decoder_size": 64,
                 "freq_pool": "avg"},
        n_classes=12,
    )
    x = jnp.asarray(rng.standard_normal((2, 7, 64, 40)), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["event_frame_logit"].shape == (2, 4, 12)   # T/16
    assert out["doa_frame_output"].shape == (2, 4, 36)
    assert np.all(np.abs(np.asarray(out["doa_frame_output"])) <= 1.0)


def test_interpolate_index_repeat_matches_reference_semantics():
    # reference interpolate_tensor: out[t] = in[floor(t / ratio)]
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 6, 2)
    up = interpolate_index_repeat(x, 2.0)
    assert up.shape == (1, 12, 2)
    np.testing.assert_array_equal(np.asarray(up[0, :4, 0]), [0, 0, 2, 2])
    down = interpolate_index_repeat(x, 0.5)
    np.testing.assert_array_equal(np.asarray(down[0, :, 0]), [0, 4, 8])


def test_param_count_matches_reference():
    ref = load_reference_models()
    if ref is None:
        pytest.skip("reference not mounted")
    t_enc = ref.encoders.PannResNet22(n_input_channels=7)
    t_dec = ref.decoders.SeldDecoder(n_output_channels=512, n_classes=12,
                                     output_format="reg_xyz", decoder_type="bigru",
                                     decoder_size=256, freq_pool="avg")
    n_torch = sum(p.numel() for p in t_enc.parameters()) + sum(
        p.numel() for p in t_dec.parameters()
    )
    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": "bigru", "decoder_size": 256,
                 "freq_pool": "avg"},
        n_classes=12,
    )
    x = jnp.zeros((1, 7, 64, 40), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    n_jax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert n_jax == n_torch, f"param count mismatch: jax {n_jax} vs torch {n_torch}"


# ---------------------------------------------------------------------------
# GRU numerical parity vs torch.nn.GRU
# ---------------------------------------------------------------------------

def copy_torch_rnn_into_stack(t_rnn, params, cell="gru", bidirectional=True):
    """Copy torch (bi)GRU/LSTM weights into RNNStack params (gate layouts match)."""
    new = jax.tree.map(lambda x: x, params)  # shallow copy as mutable dict tree
    import flax

    new = flax.core.unfreeze(new) if hasattr(flax.core, "unfreeze") else dict(new)
    for layer in range(t_rnn.num_layers):
        for direction, suffix in ((0, ""), (1, "_reverse")):
            if direction == 1 and not bidirectional:
                continue
            name = f"l{layer}_{'fwd' if direction == 0 else 'bwd'}"
            wi = getattr(t_rnn, f"weight_ih_l{layer}{suffix}").detach().numpy().T
            wh = getattr(t_rnn, f"weight_hh_l{layer}{suffix}").detach().numpy().T
            bi = getattr(t_rnn, f"bias_ih_l{layer}{suffix}").detach().numpy()
            bh = getattr(t_rnn, f"bias_hh_l{layer}{suffix}").detach().numpy()
            new[name] = {"wi": jnp.asarray(wi), "wh": jnp.asarray(wh),
                         "bi": jnp.asarray(bi), "bh": jnp.asarray(bh)}
    return new


@pytest.mark.parametrize("cell,bidirectional", [("gru", True), ("gru", False),
                                                ("lstm", True), ("lstm", False)])
def test_rnn_stack_matches_torch(rng, cell, bidirectional):
    B, T, D, H = 3, 11, 8, 16
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    torch_cls = torch.nn.GRU if cell == "gru" else torch.nn.LSTM
    t_rnn = torch_cls(input_size=D, hidden_size=H, num_layers=2, batch_first=True,
                      bidirectional=bidirectional, dropout=0.0)
    t_out, _ = t_rnn(torch.from_numpy(x))
    t_out = t_out.detach().numpy()

    stack = RNNStack(cell=cell, hidden_size=H, num_layers=2,
                     bidirectional=bidirectional, dropout_rate=0.0)
    variables = stack.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = copy_torch_rnn_into_stack(t_rnn, variables["params"], cell, bidirectional)
    j_out = np.asarray(stack.apply({"params": params}, jnp.asarray(x), train=False))

    np.testing.assert_allclose(j_out, t_out, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Full encoder numerical parity vs reference PannResNet22
# ---------------------------------------------------------------------------

def _flatten_torch_convbn_sequence(ref_encoder):
    """Yield the reference encoder's (conv, bn) modules in deterministic order
    aligned with the flax module's construction order."""
    seq = []
    cb = ref_encoder.conv_block1
    seq += [("conv", cb.conv1), ("bn", cb.bn1), ("conv", cb.conv2), ("bn", cb.bn2)]
    rn = ref_encoder.resnet
    for layer in (rn.layer1, rn.layer2, rn.layer3, rn.layer4):
        for block in layer:
            seq += [("conv", block.conv1), ("bn", block.bn1),
                    ("conv", block.conv2), ("bn", block.bn2)]
            if block.downsample is not None:
                mods = list(block.downsample)
                convs = [m for m in mods if isinstance(m, torch.nn.Conv2d)]
                bns = [m for m in mods if isinstance(m, torch.nn.BatchNorm2d)]
                seq += [("conv", convs[0]), ("bn", bns[0])]
    return seq


def _flatten_flax_convbn_paths(params):
    """Collect (path, kind) in flax init order: DoubleConvBlock then ResNet blocks,
    with shortcut conv/bn LAST within each block (flax traces them after the mains)."""
    paths = []
    dcb = params["DoubleConvBlock_0"]
    for i in range(2):
        paths.append((("DoubleConvBlock_0", f"ConvBnRelu_{i}", "Conv_0"), "conv"))
        paths.append((("DoubleConvBlock_0", f"ConvBnRelu_{i}", "BatchNorm_0"), "bn"))
    trunk = params["ResNetTrunk_0"]
    for b in range(8):
        base = ("ResNetTrunk_0", f"ResNetBasicBlock_{b}")
        block = trunk[f"ResNetBasicBlock_{b}"]
        paths.append((base + ("Conv_0",), "conv"))
        paths.append((base + ("BatchNorm_0",), "bn"))
        paths.append((base + ("Conv_1",), "conv"))
        paths.append((base + ("BatchNorm_1",), "bn"))
        if "Conv_2" in block:
            paths.append((base + ("Conv_2",), "conv"))
            paths.append((base + ("BatchNorm_2",), "bn"))
    return paths


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def test_encoder_matches_reference_torch(rng):
    ref = load_reference_models()
    if ref is None:
        pytest.skip("reference not mounted")
    t_enc = ref.encoders.PannResNet22(n_input_channels=7)
    t_enc.eval()
    # randomize torch params so the comparison is not trivially zeros
    with torch.no_grad():
        for p in t_enc.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
        for m in t_enc.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.02)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)

    from salsa_tpu.models.encoders import PannResNet22 as JaxEnc
    import flax

    jenc = JaxEnc(n_input_channels=7)
    x = rng.standard_normal((2, 7, 32, 16)).astype(np.float32)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = jenc.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])

    torch_seq = _flatten_torch_convbn_sequence(t_enc)
    flax_paths = _flatten_flax_convbn_paths(params)
    assert len(torch_seq) == len(flax_paths)
    for (kind_t, mod), (path, kind_f) in zip(torch_seq, flax_paths):
        assert kind_t == kind_f, (path, kind_t, kind_f)
        if kind_t == "conv":
            w = mod.weight.detach().numpy()  # (out, in, kh, kw)
            _set_path(params, path + ("kernel",), jnp.asarray(w.transpose(2, 3, 1, 0)))
        else:
            _set_path(params, path + ("scale",), jnp.asarray(mod.weight.detach().numpy()))
            _set_path(params, path + ("bias",), jnp.asarray(mod.bias.detach().numpy()))
            _set_path(stats, path + ("mean",), jnp.asarray(mod.running_mean.numpy()))
            _set_path(stats, path + ("var",), jnp.asarray(mod.running_var.numpy()))

    with torch.no_grad():
        t_out = t_enc(torch.from_numpy(x)).numpy()  # (B, 512, T/16, F/8)
    j_out = np.asarray(
        jenc.apply({"params": params, "batch_stats": stats}, x_nhwc, train=False)
    )
    j_out_nchw = np.transpose(j_out, (0, 3, 1, 2))
    np.testing.assert_allclose(j_out_nchw, t_out, atol=2e-4, rtol=1e-3)


def test_fast_dropout_semantics(rng):
    """FastDropout (u32-threshold, mask-regenerating VJP): keep fraction ~ 1-rate,
    survivors scaled by 1/(1-rate), backward mask identical to forward mask,
    deterministic mode is identity."""
    import jax
    from salsa_tpu.ops.dropout import dropout

    x = jnp.asarray(rng.standard_normal((512, 517)), jnp.float32)
    key = jax.random.PRNGKey(42)
    rate = 0.1
    y = np.asarray(dropout(x, key, rate))
    kept = y != 0
    assert abs(kept.mean() - 0.9) < 0.01
    np.testing.assert_allclose(y[kept], np.asarray(x)[kept] / 0.9, rtol=1e-6)

    # backward regenerates the same mask: grad of sum == scale on kept, 0 on dropped
    g = np.asarray(jax.grad(lambda xx: dropout(xx, key, rate).sum())(x))
    np.testing.assert_allclose(g[kept], 1.0 / 0.9, rtol=1e-6)
    assert np.all(g[~kept] == 0)

    # same key -> same mask; different key -> different mask
    y2 = np.asarray(dropout(x, key, rate))
    np.testing.assert_array_equal(y, y2)
    y3 = np.asarray(dropout(x, jax.random.PRNGKey(43), rate))
    assert not np.array_equal(y, y3)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_fused_bidir_scan_matches_unfused(rng, cell):
    """The single-scan bidirectional path is numerically identical to two
    independent direction scans (same params, same outputs)."""
    B, T, D, H = 3, 11, 8, 16
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    fused = RNNStack(cell=cell, hidden_size=H, num_layers=2, bidirectional=True,
                     dropout_rate=0.0, fused=True)
    unfused = RNNStack(cell=cell, hidden_size=H, num_layers=2, bidirectional=True,
                       dropout_rate=0.0, fused=False)
    v = fused.init(jax.random.PRNGKey(0), x, train=False)
    a = np.asarray(fused.apply(v, x, train=False))
    b = np.asarray(unfused.apply(v, x, train=False))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_bottleneck_block_matches_reference_torch(rng):
    """ResNetBottleneckBlock vs the reference's (unused-by-any-model) torch
    _ResnetBottleneck (model_utils.py:372-426): weight transplant, eval forward."""
    ref = load_reference_models()
    if ref is None:
        pytest.skip("reference not mounted")
    import flax
    from salsa_tpu.models.layers import ResNetBottleneckBlock

    planes = 16
    t_blk = ref.model_utils._ResnetBottleneck(inplanes=4 * planes, planes=planes)
    t_blk.eval()
    with torch.no_grad():
        for p in t_blk.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
        for m in t_blk.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.02)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)

    j_blk = ResNetBottleneckBlock(features=planes)
    x = rng.standard_normal((2, 4 * planes, 8, 6)).astype(np.float32)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = j_blk.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    for i, (conv, bn) in enumerate([(t_blk.conv1, t_blk.bn1), (t_blk.conv2, t_blk.bn2),
                                    (t_blk.conv3, t_blk.bn3)]):
        w = conv.weight.detach().numpy()
        params[f"Conv_{i}"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        params[f"BatchNorm_{i}"]["scale"] = jnp.asarray(bn.weight.detach().numpy())
        params[f"BatchNorm_{i}"]["bias"] = jnp.asarray(bn.bias.detach().numpy())
        stats[f"BatchNorm_{i}"]["mean"] = jnp.asarray(bn.running_mean.numpy())
        stats[f"BatchNorm_{i}"]["var"] = jnp.asarray(bn.running_var.numpy())

    with torch.no_grad():
        t_out = t_blk(torch.from_numpy(x)).numpy()
    j_out = np.asarray(j_blk.apply({"params": params, "batch_stats": stats},
                                   x_nhwc, train=False))
    np.testing.assert_allclose(np.transpose(j_out, (0, 3, 1, 2)), t_out,
                               atol=2e-4, rtol=1e-3)


def test_bottleneck_trunk_shapes(rng):
    from salsa_tpu.models.layers import ResNetTrunk

    trunk = ResNetTrunk(layers=(1, 1, 1, 1), block="bottleneck")
    x = jnp.asarray(rng.standard_normal((1, 32, 16, 64)), jnp.float32)
    v = trunk.init(jax.random.PRNGKey(0), x, train=False)
    out = trunk.apply(v, x, train=False)
    assert out.shape == (1, 4, 2, 2048)  # expansion 4 on the 512 stage
