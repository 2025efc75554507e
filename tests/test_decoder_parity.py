"""Full-decoder numerical parity: reference SeldDecoder (torch, bigru) vs ours with
copied weights, eval mode."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from salsa_tpu.models.decoders import SeldDecoder
from tests.torch_ref import load_reference_models
from tests.test_models import copy_torch_rnn_into_stack

torch = pytest.importorskip("torch")


def test_decoder_matches_reference_torch(rng):
    ref = load_reference_models()
    if ref is None:
        pytest.skip("reference not mounted")
    t_dec = ref.decoders.SeldDecoder(
        n_output_channels=64, n_classes=5, output_format="reg_xyz",
        decoder_type="bigru", decoder_size=32, freq_pool="avg",
    )
    t_dec.eval()
    with torch.no_grad():
        for p in t_dec.parameters():
            p.copy_(torch.randn_like(p) * 0.1)

    j_dec = SeldDecoder(n_output_channels=64, n_classes=5, decoder_type="bigru",
                        decoder_size=32, freq_pool="avg")
    x = rng.standard_normal((2, 64, 8, 4)).astype(np.float32)  # (B, C, T', F')
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))        # (B, T', F', C)
    variables = j_dec.init(jax.random.PRNGKey(0), x_nhwc, train=False)

    import flax
    params = flax.core.unfreeze(variables["params"])
    params["RNNStack_0"] = copy_torch_rnn_into_stack(
        t_dec.gru, params["RNNStack_0"], cell="gru", bidirectional=True
    )
    head_map = {
        "event_fc1": t_dec.event_fc_1, "event_fc2": t_dec.event_fc_2,
        "x_fc1": t_dec.x_fc_1, "x_fc2": t_dec.x_fc_2,
        "y_fc1": t_dec.y_fc_1, "y_fc2": t_dec.y_fc_2,
        "z_fc1": t_dec.z_fc_1, "z_fc2": t_dec.z_fc_2,
    }
    for name, mod in head_map.items():
        params[name] = {
            "kernel": jnp.asarray(mod.weight.detach().numpy().T),
            "bias": jnp.asarray(mod.bias.detach().numpy()),
        }

    with torch.no_grad():
        t_out = t_dec(torch.from_numpy(x))
    j_out = j_dec.apply({"params": params}, x_nhwc, train=False)

    np.testing.assert_allclose(
        np.asarray(j_out["event_frame_logit"]),
        t_out["event_frame_logit"].numpy(), atol=3e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(j_out["doa_frame_output"]),
        t_out["doa_frame_output"].numpy(), atol=3e-5, rtol=1e-4,
    )


def test_transformer_decoder_matches_reference_torch(rng):
    """Fifth decoder type: transformer (reference decoders.py:63-72 — 2-layer
    post-LN torch TransformerEncoder, nhead=8, ff=1024, over 0.1-scaled sin/cos
    PE from model_utils.py:266-298). Weight transplant via the same mapping the
    checkpoint importer uses (interop.transformer_layer_params)."""
    ref = load_reference_models()
    if ref is None:
        pytest.skip("reference not mounted")
    t_dec = ref.decoders.SeldDecoder(
        n_output_channels=64, n_classes=5, output_format="reg_xyz",
        decoder_type="transformer", decoder_size=32, freq_pool="avg",
    )
    t_dec.eval()
    with torch.no_grad():
        for p in t_dec.parameters():
            p.copy_(torch.randn_like(p) * 0.1)

    j_dec = SeldDecoder(n_output_channels=64, n_classes=5,
                        decoder_type="transformer", freq_pool="avg")
    x = rng.standard_normal((2, 64, 8, 4)).astype(np.float32)  # (B, C, T', F')
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = j_dec.init(jax.random.PRNGKey(0), x_nhwc, train=False)

    import flax
    from salsa_tpu.interop.torch_ckpt import transformer_layer_params

    params = flax.core.unfreeze(variables["params"])
    for i in range(2):
        layer = t_dec.decoder_layer.layers[i]
        get = lambda name, _l=layer: _l.state_dict()[name].numpy()
        params[f"TransformerEncoderLayer_{i}"] = transformer_layer_params(
            get, d_model=64, n_heads=8)
    head_map = {
        "event_fc1": t_dec.event_fc_1, "event_fc2": t_dec.event_fc_2,
        "x_fc1": t_dec.x_fc_1, "x_fc2": t_dec.x_fc_2,
        "y_fc1": t_dec.y_fc_1, "y_fc2": t_dec.y_fc_2,
        "z_fc1": t_dec.z_fc_1, "z_fc2": t_dec.z_fc_2,
    }
    for name, mod in head_map.items():
        params[name] = {
            "kernel": jnp.asarray(mod.weight.detach().numpy().T),
            "bias": jnp.asarray(mod.bias.detach().numpy()),
        }

    with torch.no_grad():
        t_out = t_dec(torch.from_numpy(x))
    j_out = j_dec.apply({"params": params}, x_nhwc, train=False)

    np.testing.assert_allclose(
        np.asarray(j_out["event_frame_logit"]),
        t_out["event_frame_logit"].numpy(), atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(j_out["doa_frame_output"]),
        t_out["doa_frame_output"].numpy(), atol=2e-4, rtol=1e-4,
    )
