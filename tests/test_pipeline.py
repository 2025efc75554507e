import numpy as np
import jax

from salsa_tpu.features.registry import make_extractor
from salsa_tpu.models.seld import build_model
from salsa_tpu.pipeline import SeldInferencePipeline


def test_fused_pipeline_matches_staged(rng):
    """wav -> prediction in one jit graph == offline extract + normalize + model."""
    fs, n_fft, hop = 8000, 256, 400
    extractor = make_extractor("salsa_lite", "mic", fs=fs, n_fft=n_fft, hop_length=hop,
                               fmax_doa=2000.0, jit=False)
    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": "gru", "decoder_size": 16},
        n_classes=3,
    )
    wave = rng.standard_normal((4, int(3.2 * fs))).astype(np.float32) * 0.1
    feat = np.asarray(extractor(wave))
    mean = feat[:4].mean(axis=1, keepdims=True)
    std = feat[:4].std(axis=1, keepdims=True) + 1e-6

    import jax.numpy as jnp
    x = jnp.zeros((1, 7) + feat.shape[1:], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    interp_ratio = 16 * 10 / (fs / hop)  # = 8
    pipe = SeldInferencePipeline(extractor, model, variables, (mean, std),
                                 interp_ratio, n_classes=3)
    ev_fused, doa_fused = pipe(wave)

    # staged path
    feat_n = feat.copy()
    feat_n[:4] = (feat_n[:4] - mean) / std
    out = model.apply(variables, jnp.asarray(feat_n)[None], train=False)
    from salsa_tpu.models.seld import interpolate_index_repeat
    ev_staged = np.asarray(
        jax.nn.sigmoid(interpolate_index_repeat(out["event_frame_logit"], interp_ratio))
    )[0]
    doa_staged = np.asarray(
        interpolate_index_repeat(out["doa_frame_output"], interp_ratio)
    )[0]

    np.testing.assert_allclose(ev_fused, ev_staged, atol=1e-5)
    np.testing.assert_allclose(doa_fused, doa_staged, atol=1e-5)
    assert ev_fused.shape[0] == 32  # 65 feature frames -> T'=4 after /16 -> x8 = 32


def test_pipeline_batched(rng):
    fs, n_fft, hop = 8000, 256, 400
    extractor = make_extractor("salsa_lite", "mic", fs=fs, n_fft=n_fft, hop_length=hop,
                               fmax_doa=2000.0, jit=False)
    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": "gru", "decoder_size": 16},
        n_classes=3,
    )
    waves = rng.standard_normal((2, 4, int(3.2 * fs))).astype(np.float32) * 0.1
    import jax.numpy as jnp
    feat = np.asarray(extractor(waves[0]))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 7) + feat.shape[1:], jnp.float32),
        train=False,
    )
    mean = np.zeros((4, 1, feat.shape[2]), np.float32)
    std = np.ones((4, 1, feat.shape[2]), np.float32)
    pipe = SeldInferencePipeline(extractor, model, variables, (mean, std), 8.0, 3)
    ev, doa = pipe(waves)
    assert ev.shape[0] == 2 and doa.shape[-1] == 9
