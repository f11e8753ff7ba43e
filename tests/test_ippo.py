"""IPPO trainer tests: a tiny end-to-end training run must produce finite
losses, update parameters, and run sharded over the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaxmarl_hft_tpu.envs.marl import MarlEnv
from jaxmarl_hft_tpu.rl.ippo import default_train_config, make_train
from jaxmarl_hft_tpu.rl.baselines import (FixedActionPolicy, RandomPolicy,
                                          rollout)

from test_marl_env import make_test_config


@pytest.fixture(scope="module")
def env():
    return MarlEnv(jax.random.PRNGKey(0), make_test_config())


def small_config(**kw):
    base = dict(NUM_ENVS=4, NUM_STEPS=8, TOTAL_TIMESTEPS=4 * 8 * 3,
                NUM_MINIBATCHES=2, UPDATE_EPOCHS=2, FC_DIM_SIZE=32,
                GRU_HIDDEN_DIM=32)
    base.update(kw)
    return default_train_config(**base)


def test_train_runs_and_learns(env):
    train = make_train(small_config(), env)
    out = train(jax.random.PRNGKey(0), num_updates=3)
    metrics = out["metrics"]
    assert len(metrics) == 3
    for m in metrics:
        for loss in m["loss"]:
            for v in loss.values():
                assert np.isfinite(v), loss
    # params must have changed
    ts0 = train.init_state(jax.random.PRNGKey(0))[0]
    p_new = out["runner_state"][0][0].params
    p_old = ts0[0].params
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p_old,
                         p_new)
    assert max(jax.tree.leaves(diffs)) > 0


def test_train_deterministic(env):
    train = make_train(small_config(), env)
    m1 = train(jax.random.PRNGKey(7), num_updates=2)["metrics"]
    m2 = train(jax.random.PRNGKey(7), num_updates=2)["metrics"]
    l1 = [m["loss"][0]["total_loss"] for m in m1]
    l2 = [m["loss"][0]["total_loss"] for m in m2]
    np.testing.assert_allclose(l1, l2)


def test_chunked_updates_match_looped(env):
    """chunk>1 scans update steps inside one jitted program (one host fetch
    per chunk); the math is the identical _update_step sequence, so losses
    and final params match the per-update loop exactly."""
    train = make_train(small_config(), env)
    out1 = train(jax.random.PRNGKey(5), num_updates=4)
    out2 = train(jax.random.PRNGKey(5), num_updates=4, chunk=3)  # 3 + 1
    l1 = [m["loss"][0]["total_loss"] for m in out1["metrics"]]
    l2 = [m["loss"][0]["total_loss"] for m in out2["metrics"]]
    np.testing.assert_array_equal(l1, l2)
    p1 = out1["runner_state"][0][0].params
    p2 = out2["runner_state"][0][0].params
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), p1, p2)


def test_env_chunked_rollout_matches_unchunked(env):
    """ENV_CHUNKS splits the rollout env batch into sequential lax.map
    chunks (a TPU pipelining lever, probe_step_chunk_tpu.py); per-env math
    is untouched so losses and params must be bit-identical."""
    out1 = make_train(small_config(), env)(jax.random.PRNGKey(9),
                                           num_updates=3)
    out2 = make_train(small_config(ENV_CHUNKS=2), env)(jax.random.PRNGKey(9),
                                                       num_updates=3)
    l1 = [m["loss"][i]["total_loss"] for m in out1["metrics"]
          for i in range(2)]
    l2 = [m["loss"][i]["total_loss"] for m in out2["metrics"]
          for i in range(2)]
    np.testing.assert_array_equal(l1, l2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 out1["runner_state"][0][0].params,
                 out2["runner_state"][0][0].params)
    with pytest.raises(ValueError, match="ENV_CHUNKS"):
        make_train(small_config(ENV_CHUNKS=3), env)(jax.random.PRNGKey(9),
                                                    num_updates=1)


def test_train_bfloat16_compute(env):
    """NETWORK_DTYPE=bfloat16 (MXU compute dtype; params/logits/values f32)
    must train with finite losses and actually move the parameters."""
    train = make_train(small_config(NETWORK_DTYPE="bfloat16"), env)
    out = train(jax.random.PRNGKey(3), num_updates=2)
    for m in out["metrics"]:
        for loss in m["loss"]:
            for v in loss.values():
                assert np.isfinite(v), loss
    ts0 = train.init_state(jax.random.PRNGKey(3))[0]
    p_new = out["runner_state"][0][0].params
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         ts0[0].params, p_new)
    assert max(jax.tree.leaves(diffs)) > 0
    # parameters must remain f32 master copies
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(p_new))


def test_train_sharded_matches_unsharded(env):
    """Data-parallel over the 8-device CPU mesh: same math as single-device
    (the batch is sharded, parameters replicated)."""
    from jaxmarl_hft_tpu.parallel.mesh import make_mesh
    cfg = small_config(NUM_ENVS=8)
    train_plain = make_train(cfg, env)
    out_plain = train_plain(jax.random.PRNGKey(3), num_updates=2)

    mesh = make_mesh(8)
    train_mesh = make_train(cfg, env, mesh=mesh)
    out_mesh = train_mesh(jax.random.PRNGKey(3), num_updates=2)

    for mp, mm in zip(out_plain["metrics"], out_mesh["metrics"]):
        for lp, lm in zip(mp["loss"], mm["loss"]):
            np.testing.assert_allclose(lp["total_loss"], lm["total_loss"],
                                       rtol=2e-4, atol=2e-5)


def test_env_chunked_sharded_matches_unsharded(env):
    """ENV_CHUNKS composes with a device mesh (round-5, VERDICT r4 item 5):
    chunking is shard-local — each device splits its own env shard — so a
    chunked mesh run must match the unchunked single-device run. Per-env
    math is untouched; losses track the unsharded reference up to the same
    float-reduction tolerance as the plain sharded test."""
    from jaxmarl_hft_tpu.parallel.mesh import make_mesh
    cfg = small_config(NUM_ENVS=16)
    out_plain = make_train(cfg, env)(jax.random.PRNGKey(11), num_updates=2)

    mesh = make_mesh(8)
    cfg_c = small_config(NUM_ENVS=16, ENV_CHUNKS=2)
    out_mesh = make_train(cfg_c, env, mesh=mesh)(jax.random.PRNGKey(11),
                                                 num_updates=2)
    for mp, mm in zip(out_plain["metrics"], out_mesh["metrics"]):
        for lp, lm in zip(mp["loss"], mm["loss"]):
            np.testing.assert_allclose(lp["total_loss"], lm["total_loss"],
                                       rtol=2e-4, atol=2e-5)
    # and bit-identical to the UNCHUNKED mesh run (same device count, same
    # reduction order — chunking must not change a single env's output)
    out_mesh_nc = make_train(small_config(NUM_ENVS=16), env, mesh=mesh)(
        jax.random.PRNGKey(11), num_updates=2)
    for mm, mn in zip(out_mesh["metrics"], out_mesh_nc["metrics"]):
        for lm, ln in zip(mm["loss"], mn["loss"]):
            np.testing.assert_array_equal(lm["total_loss"],
                                          ln["total_loss"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 out_mesh["runner_state"][0][0].params,
                 out_mesh_nc["runner_state"][0][0].params)


def test_baseline_rollout(env):
    policies = [RandomPolicy(env.action_spaces[0]),
                FixedActionPolicy(0)]
    rewards, done_seq, infos, _ = rollout(env, policies, num_envs=4,
                                       num_steps=8, seed=0)
    assert np.asarray(rewards[0]).shape == (8, 4, 1)
    assert np.all(np.isfinite(np.asarray(rewards[0])))
    assert np.all(np.isfinite(np.asarray(rewards[1])))


def test_checkpoint_roundtrip(env, tmp_path):
    """Orbax save -> restore reproduces the trained parameters exactly
    (reference: ippo_rnn_JAXMARL.py:1088-1133 save, baseline_JAXMARL.py
    :502-585 restore-into-target)."""
    from jaxmarl_hft_tpu.rl.checkpoint import (make_checkpoint_manager,
                                               restore_checkpoint,
                                               save_checkpoint)
    train = make_train(small_config(), env)
    out = train(jax.random.PRNGKey(1), num_updates=2)
    train_states = out["runner_state"][0]

    mgr = make_checkpoint_manager(str(tmp_path / "ckpt"))
    save_checkpoint(mgr, 2, train_states, metrics=out["metrics"][-1])
    assert mgr.latest_step() == 2

    target = {"model": [jax.device_get(ts.params) for ts in train_states],
              "metrics": jax.device_get(out["metrics"][-1]["loss"])}
    zero_target = jax.tree.map(np.zeros_like, target)
    restored = restore_checkpoint(mgr, target=zero_target)
    for got, want in zip(jax.tree.leaves(restored["model"]),
                         jax.tree.leaves(target["model"])):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_train_resume_bit_exact(env, tmp_path):
    """Full training resume (params + optimizer + env/PRNG state): 2 updates
    + resume for 2 more == 4 uninterrupted updates, bit-for-bit. The
    reference cannot do this (restore is eval-only, SURVEY.md §5)."""
    from jaxmarl_hft_tpu.rl.checkpoint import make_checkpoint_manager

    cfg = small_config()
    train = make_train(cfg, env)
    out_straight = train(jax.random.PRNGKey(5), num_updates=4)

    mgr = make_checkpoint_manager(str(tmp_path / "resume_ckpt"),
                                  max_to_keep=1)
    train(jax.random.PRNGKey(5), num_updates=2, checkpoint_manager=mgr,
          full_checkpoints=True)
    assert mgr.latest_step() == 1

    out_resumed = train(jax.random.PRNGKey(5), num_updates=4,
                        resume_from=mgr)
    assert len(out_resumed["metrics"]) == 2  # only updates 2 and 3 ran

    p_straight = [ts.params for ts in out_straight["runner_state"][0]]
    p_resumed = [ts.params for ts in out_resumed["runner_state"][0]]
    for a, b in zip(jax.tree.leaves(p_straight), jax.tree.leaves(p_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state also continues exactly
    o_straight = [ts.opt_state for ts in out_straight["runner_state"][0]]
    o_resumed = [ts.opt_state for ts in out_resumed["runner_state"][0]]
    for a, b in zip(jax.tree.leaves(o_straight), jax.tree.leaves(o_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_autoregressive_heads():
    """Multi-head autoregressive output wiring (used for fixed_prices-style
    action spaces)."""
    from jaxmarl_hft_tpu.rl.networks import ActorCriticRNN, ScannedRNN
    cfg = {"FC_DIM_SIZE": 16, "GRU_HIDDEN_DIM": 16, "AUTOREGRESSIVE": True}
    net = ActorCriticRNN([4, 5, 3], config=cfg)
    h = ScannedRNN.initialize_carry(2, 16)
    x = (jnp.zeros((1, 2, 6)), jnp.zeros((1, 2)))
    params = net.init(jax.random.PRNGKey(0), h, x)
    h2, pi, v = net.apply(params, h, x)
    a = pi.sample(seed=jax.random.PRNGKey(1))
    assert a.shape == (1, 2, 3)
    lp = pi.log_prob(a)
    assert np.all(np.isfinite(np.asarray(lp)))
    ent = pi.entropy()
    assert np.all(np.asarray(ent) > 0)


def test_baseline_rollout_single_env(env):
    """rollout with num_envs=1: the env axis must survive action squeezing
    (a bare .squeeze() used to collapse it and crash the vmapped step)."""
    policies = [RandomPolicy(sp) for sp in env.action_spaces]
    rewards, dones, infos, _ = rollout(env, policies, num_envs=1, num_steps=4,
                                    seed=0)
    assert all(np.asarray(r).shape[:2] == (4, 1) for r in rewards)


def test_periodic_eval_rollout(env):
    """Periodic held-out eval (reference CALC_EVAL): eval_avg_reward is
    logged at the requested cadence, and the cached jitted eval threads the
    CURRENT params as arguments (round-5 fix: rebuilding policies per call
    baked params in as constants and recompiled every eval)."""
    train = make_train(small_config(), env)
    out = train(jax.random.PRNGKey(2), num_updates=4, eval_env=env,
                eval_every=2, eval_envs=2, eval_steps=4)
    have = [i for i, m in enumerate(out["metrics"])
            if "eval_avg_reward" in m]
    assert have == [1, 3]
    for i in have:
        vals = out["metrics"][i]["eval_avg_reward"]
        assert len(vals) == 2 and all(np.isfinite(v) for v in vals)


def test_train_single_env(env):
    """NUM_ENVS=1 (review finding, round 5): the per-type action squeeze
    used to collapse the env axis and crash the vmapped env.step; the
    actor-axis reshapes must keep every (A=1,) axis alive end to end."""
    cfg = small_config(NUM_ENVS=1, NUM_MINIBATCHES=1, NUM_STEPS=8,
                       TOTAL_TIMESTEPS=8 * 2)
    out = make_train(cfg, env)(jax.random.PRNGKey(4), num_updates=2)
    for m in out["metrics"]:
        for loss in m["loss"]:
            assert np.isfinite(loss["total_loss"])
