"""AOT-serialized sampler executables (serve/aot.py): export once, any later
process deserializes the StableHLO and samples without re-tracing the model
(VERDICT r04 item 7 — the serving cold start's dominant cost on a 1-core
host was per-process tracing)."""

import jax
import jax.numpy as jnp
import numpy as np

from osufusion_tpu.config import DiffusionConfig
from osufusion_tpu.models import DiffusionModel
from osufusion_tpu.serve.aot import export_sampler, load_or_export_sampler, load_sampler

from tests.test_models import TINY


def _model_and_inputs():
    model = DiffusionModel(TINY, DiffusionConfig(sampling_timesteps=2))
    params = model.init_params(jax.random.PRNGKey(0), seq_len=64)
    ka, kc, kx = jax.random.split(jax.random.PRNGKey(1), 3)
    a = jax.random.normal(ka, (1, 96, 64)) - 10.0
    c = jax.random.uniform(kc, (1, 5), minval=-1, maxval=1)
    x0 = jax.random.normal(kx, (1, 6, 64))
    return model, params, a, c, x0


def test_aot_roundtrip_matches_direct_sample(tmp_path):
    model, params, a, c, x0 = _model_and_inputs()
    direct = np.asarray(model.sample(params, a, c, x=x0, cond_scale=1.5, sampling_timesteps=2))

    assert load_sampler(model, a.shape, steps=2, cond_scale=1.5, aot_dir=tmp_path) is None
    path = export_sampler(model, params, a.shape, steps=2, cond_scale=1.5, aot_dir=tmp_path)
    assert path.exists() and path.stat().st_size > 1000

    run = load_sampler(model, a.shape, steps=2, cond_scale=1.5, aot_dir=tmp_path)
    assert run is not None
    out = np.asarray(run(params, a, c, x0))
    np.testing.assert_allclose(out, direct, atol=1e-5, rtol=1e-5)


def test_aot_key_separates_programs(tmp_path):
    model, params, a, c, x0 = _model_and_inputs()
    export_sampler(model, params, a.shape, steps=2, cond_scale=1.5, aot_dir=tmp_path)
    # different step count / sampler / cfg scale: different artifact
    assert load_sampler(model, a.shape, steps=3, cond_scale=1.5, aot_dir=tmp_path) is None
    assert load_sampler(model, a.shape, steps=2, cond_scale=2.0, aot_dir=tmp_path) is None
    assert load_sampler(model, a.shape, steps=2, sampler="dpmpp-2m", cond_scale=1.5, aot_dir=tmp_path) is None


def test_aot_load_or_export_dpm(tmp_path):
    model, params, a, c, x0 = _model_and_inputs()
    run = load_or_export_sampler(model, params, a.shape, steps=4, sampler="dpmpp-2m", cond_scale=1.0, aot_dir=tmp_path)
    direct = np.asarray(
        model.sample(params, a, c, x=x0, cond_scale=1.0, sampling_timesteps=4, method="dpmpp-2m")
    )
    np.testing.assert_allclose(np.asarray(run(params, a, c, x0)), direct, atol=1e-5, rtol=1e-5)
