"""Trainer integration: short runs must improve the ELBO; eval/R², checkpoint
round-trip, CLI smoke (SURVEY.md §4.5)."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_FAST = pytest.mark.fast  # <2 min verification subset (VERDICT r3 #7)

from psvo_tpu.config import Config, DataConfig, SMCConfig, TrainConfig
from psvo_tpu.data import generate_dataset
from psvo_tpu.models.ssm import init_ssm
from psvo_tpu.train import Trainer, make_eval_step


def _cfg(objective="fivo", k=32, steps=40):
    return Config(
        name=f"train_test_{objective}",
        seed=0,
        data=DataConfig(
            datatype="fhn", dx=2, dy=2, t_steps=25, n_train=24, n_test=8, obs_scale=0.3
        ),
        smc=SMCConfig(
            objective=objective, n_particles=k, n_smoothing_particles=4,
            resampling="none" if objective == "iwae" else "systematic",
        ),
        train=TrainConfig(lr=3e-3, batch_size=8, n_steps=steps, eval_every=steps // 2),
        use_pallas=False,
    )


@pytest.mark.parametrize(
    "objective",
    [pytest.param("fivo", marks=_FAST), "svo", "psvo"],  # fast: one smoke
)
def test_short_training_improves_elbo(objective):
    cfg = _cfg(objective, steps=30 if objective != "fivo" else 40)
    ds = generate_dataset(cfg.data, cfg.seed)
    ssm, params = init_ssm(cfg, jax.random.key(cfg.seed))

    ev = make_eval_step(ssm, cfg)
    before = float(ev(params, jax.random.key(7), ds.obs_test)["elbo"])
    trainer = Trainer(cfg, ssm, params)
    trainer.run(ds.obs_train, ds.obs_test)
    after = float(ev(trainer.state.params, jax.random.key(7), ds.obs_test)["elbo"])
    assert after > before, (before, after)
    # objective-specific bound extras persist to the eval record (a user
    # comparing PSVO's forward vs direct bound reads metrics.jsonl)
    rec = trainer.history[-1]
    if objective == "psvo":
        assert np.isfinite(rec["elbo_psvo_direct"])
        assert np.isfinite(rec["log_joint_smoothed"])
    if objective == "svo":
        assert np.isfinite(rec["elbo_svo"])


def test_steps_per_call_is_bit_identical_to_single_steps():
    """steps_per_call folds N steps into one jitted lax.scan but walks the
    SAME host-side key-split chain and minibatch-sampling sequence, so the
    trained params must be bit-identical to the N=1 path."""
    base = _cfg("fivo", steps=8)
    base = dataclasses.replace(
        base, train=dataclasses.replace(base.train, eval_every=4)
    )
    ds = generate_dataset(base.data, base.seed)
    ssm, params = init_ssm(base, jax.random.key(base.seed))

    results = {}
    for spc in (1, 4):
        cfg = dataclasses.replace(
            base, train=dataclasses.replace(base.train, steps_per_call=spc)
        )
        tr = Trainer(cfg, ssm, params)
        tr.run(ds.obs_train, ds.obs_test)
        results[spc] = tr.state.params
        assert tr.state.step == 8
    for a, b in zip(
        jax.tree_util.tree_leaves(results[1]), jax.tree_util.tree_leaves(results[4])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # cadence misalignment is rejected loudly
    bad = dataclasses.replace(
        base, train=dataclasses.replace(base.train, steps_per_call=3)
    )
    with pytest.raises(ValueError, match="multiple of"):
        Trainer(bad, ssm, params).run(ds.obs_train, ds.obs_test)


def test_debug_checks_flags_nonfinite_and_passes_clean():
    """SURVEY.md §5 sanitizers row: checkify float checks on the train step.
    A clean step must pass its error through silently; NaN-poisoned params
    must raise with float-check provenance on throw."""
    from jax.experimental import checkify

    from psvo_tpu.train import make_optimizer, make_train_step

    cfg = _cfg("fivo", steps=2)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, debug_checks=True)
    )
    ds = generate_dataset(cfg.data, cfg.seed)
    ssm, params = init_ssm(cfg, jax.random.key(0))
    opt = make_optimizer(cfg)
    step = make_train_step(ssm, cfg, opt)
    batch = jnp.asarray(ds.obs_train[: cfg.train.batch_size])

    p, s, m = step(params, opt.init(params), jax.random.key(1), batch)
    err = m.pop("checkify_err")
    checkify.check_error(err)  # clean run: no-op
    assert np.isfinite(float(m["loss"]))

    bad = jax.tree_util.tree_map(lambda a: a * jnp.nan, params)
    _, _, m_bad = step(bad, opt.init(bad), jax.random.key(1), batch)
    with pytest.raises(Exception) as ei:
        checkify.check_error(m_bad.pop("checkify_err"))
    assert "nan" in str(ei.value).lower()


def test_eval_metrics_shapes():
    cfg = _cfg("fivo")
    ds = generate_dataset(cfg.data, cfg.seed)
    ssm, params = init_ssm(cfg, jax.random.key(0))
    ev = make_eval_step(ssm, cfg)(params, jax.random.key(1), ds.obs_test)
    assert ev["r2_k"].shape == (cfg.train.mse_k_steps,)
    assert ev["mse_k"].shape == (cfg.train.mse_k_steps,)
    assert np.isfinite(float(ev["elbo"]))


def test_checkpoint_roundtrip(tmp_path):
    from psvo_tpu.train import TrainState, make_optimizer
    from psvo_tpu.utils.checkpoint import Checkpointer

    cfg = _cfg("fivo")
    ssm, params = init_ssm(cfg, jax.random.key(0))
    opt = make_optimizer(cfg)
    best = jax.tree_util.tree_map(lambda a: a + 1.0, params)
    state = TrainState(params, opt.init(params), jax.random.key(5), step=17,
                       best_elbo=-3.5, evals_since_best=2, best_params=best)
    ck = Checkpointer(tmp_path / "ck", cfg.config_hash())
    ck.save(state, force=True)

    fresh = TrainState(
        jax.tree_util.tree_map(lambda a: a * 0, params), opt.init(params),
        jax.random.key(0),
    )
    ck2 = Checkpointer(tmp_path / "ck", cfg.config_hash())
    restored = ck2.restore(fresh)
    assert restored.step == 17
    assert restored.best_elbo == pytest.approx(-3.5)
    assert restored.evals_since_best == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # best_params travels with best_elbo: a resumed keep_best run must be able
    # to end on the best snapshot, not the last params (ADVICE r1)
    assert restored.best_params is not None
    for a, b in zip(
        jax.tree_util.tree_leaves(best),
        jax.tree_util.tree_leaves(restored.best_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a state saved WITHOUT a best snapshot restores best_params=None
    state_nb = TrainState(params, opt.init(params), jax.random.key(5), step=18)
    ck.save(state_nb, force=True)
    restored_nb = Checkpointer(tmp_path / "ck", cfg.config_hash()).restore(
        TrainState(params, opt.init(params), jax.random.key(0))
    )
    assert restored_nb.best_params is None
    # wrong config hash must refuse
    with pytest.raises(ValueError):
        Checkpointer(tmp_path / "ck", "deadbeef0000").restore(fresh)

    # params-only restore (eval path): independent of optimizer structure
    restored_params = Checkpointer(tmp_path / "ck", cfg.resume_hash()).restore_params(
        jax.tree_util.tree_map(lambda a: a * 0, params)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_presets_and_config_roundtrip(capsys):
    from psvo_tpu import cli
    from psvo_tpu.config import from_dict, preset

    assert cli.main(["presets"]) == 0
    out = capsys.readouterr().out
    assert "fhn_fivo_k128" in out

    cfg = preset("lorenz63_psvo_k1024")
    cfg2 = from_dict(json.loads(json.dumps(cfg.to_dict())))
    assert cfg2 == cfg
    assert cfg2.config_hash() == cfg.config_hash()


@_FAST
def test_cli_eval_prints_both_psvo_bounds(capsys):
    """`cli eval` on a PSVO config must surface BOTH bound forms — the
    reported forward (Rao-Blackwellized) `elbo` and the reference-form
    `elbo_psvo_direct` — in the JSON output and the summary line (VERDICT r3
    weak #7 / next #10)."""
    from psvo_tpu import cli

    rc = cli.main(
        [
            "eval",
            "--preset",
            "lorenz63_psvo_k1024",
            "--set",
            "smc.n_particles=16",
            "--set",
            "smc.n_smoothing_particles=4",
            "--set",
            "data.t_steps=10",
            "--set",
            "data.n_train=4",
            "--set",
            "data.n_test=3",
            "--set",
            "use_pallas=false",
        ]
    )
    assert rc == 0
    cap = capsys.readouterr()
    out = json.loads(cap.out)
    assert "elbo" in out and "elbo_psvo_direct" in out
    assert np.isfinite(out["elbo"]) and np.isfinite(out["elbo_psvo_direct"])
    assert "PSVO bounds" in cap.err


def test_cli_override():
    from psvo_tpu.cli import apply_overrides
    from psvo_tpu.config import preset

    cfg = apply_overrides(
        preset("fhn_fivo_k128"), ["smc.n_particles=64", "train.lr=0.001"]
    )
    assert cfg.smc.n_particles == 64
    assert cfg.train.lr == 0.001
    with pytest.raises(SystemExit):
        apply_overrides(preset("fhn_fivo_k128"), ["smc.nope=1"])


def test_data_generation_properties():
    cfg = DataConfig(datatype="lorenz63", dx=3, dy=3, t_steps=50, n_train=6, n_test=3)
    ds = generate_dataset(cfg, 0)
    assert ds.obs_train.shape == (6, 50, 3)
    assert ds.hidden_test.shape == (3, 50, 3)
    # burn-in puts trajectories on the attractor: bounded, non-trivial variance
    h = np.asarray(ds.hidden_train)
    assert np.all(np.abs(h) < 60)
    assert h.std() > 1.0
    ds2 = generate_dataset(cfg, 0)
    np.testing.assert_array_equal(np.asarray(ds.obs_train), np.asarray(ds2.obs_train))
    ds3 = generate_dataset(cfg, 1)
    assert not np.allclose(np.asarray(ds.obs_train), np.asarray(ds3.obs_train))


def test_q_uses_true_x_debug_mode():
    """The debug flag trains and evals with the encoder conditioned on the
    true latents (mismatched-din and eval-input bugs are regression-guarded:
    dx != dy here, and eval must receive hidden_test)."""
    cfg = Config(
        name="true_x_test",
        data=DataConfig(
            datatype="lorenz63", dx=3, dy=3, t_steps=15, n_train=8, n_test=4
        ),
        smc=SMCConfig(objective="fivo", n_particles=16, q_uses_true_x=True),
        train=TrainConfig(batch_size=4, n_steps=6, eval_every=3),
        use_pallas=False,
    )
    ds = generate_dataset(cfg.data, 0)
    ssm, params = init_ssm(cfg, jax.random.key(0))
    trainer = Trainer(cfg, ssm, params)
    with pytest.raises(ValueError):
        trainer.run(ds.obs_train, ds.obs_test)  # latents are required
    hist = Trainer(cfg, ssm, params).run(
        ds.obs_train, ds.obs_test,
        hidden_train=ds.hidden_train, hidden_test=ds.hidden_test,
    )
    assert np.isfinite(hist[-1]["test_elbo"])


def test_filtered_means_emitted_without_cache():
    """Eval path: filtering means come from the scan, no particle cache."""
    from psvo_tpu.smc import forward_filter
    from psvo_tpu.train import filtered_means

    cfg = _cfg("fivo")
    ds = generate_dataset(cfg.data, 0)
    ssm, params = init_ssm(cfg, jax.random.key(0))
    fwd = forward_filter(
        ssm, params, jax.random.key(1), jnp.asarray(ds.obs_test), cfg.smc, cache=True
    )
    assert fwd.filtered_means is not None and fwd.xs is not None
    # emitted means must equal the cache-derived means
    import jax.numpy as jnp2

    logw_norm = fwd.logws - jax.scipy.special.logsumexp(
        fwd.logws, axis=-1, keepdims=True
    )
    want = jnp2.swapaxes(
        jnp2.einsum("tbk,tbdk->tbd", jnp2.exp(logw_norm), fwd.xs), 0, 1
    )
    np.testing.assert_allclose(
        np.asarray(filtered_means(fwd)), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_dataset_save_load_roundtrip(tmp_path):
    from psvo_tpu.data import load_dataset, save_dataset

    cfg = DataConfig(datatype="fhn", t_steps=10, n_train=4, n_test=2)
    ds = generate_dataset(cfg, 0)
    p = tmp_path / "ds.npz"
    save_dataset(ds, p)
    ds2 = load_dataset(p)
    np.testing.assert_array_equal(np.asarray(ds.obs_train), np.asarray(ds2.obs_train))
    np.testing.assert_array_equal(
        np.asarray(ds.hidden_test), np.asarray(ds2.hidden_test)
    )


def test_poisson_emission_pipeline():
    cfg = Config(
        name="poisson_test",
        data=DataConfig(
            datatype="fhn", dx=2, dy=2, t_steps=10, n_train=4, n_test=2,
            emission="poisson",
        ),
        smc=SMCConfig(objective="fivo", n_particles=16),
        use_pallas=False,
    )
    ds = generate_dataset(cfg.data, 0)
    assert np.all(np.asarray(ds.obs_train) >= 0)
    ssm, params = init_ssm(cfg, jax.random.key(0))
    from psvo_tpu.objectives import make_objective

    out = make_objective(ssm, cfg)(params, jax.random.key(1), ds.obs_train)
    assert np.isfinite(float(out.loss))
