"""IPPO-RNN trainer: on-device rollout + GAE + clipped PPO update, one
network/optimizer per agent *type*.

Parity reference: gymnax_exchange/jaxrl/MARL/ippo_rnn_JAXMARL.py:368-1142
(make_train). Differences, all TPU-first:

  * Multi-device scaling uses jit + Mesh/NamedSharding over the env batch
    (see parallel/mesh.py) instead of the reference's single-host pmap +
    lax.pmean (ippo_rnn_JAXMARL_pmap.py:566-793). Parameters are replicated,
    the env/minibatch axis is sharded, and XLA inserts the gradient
    all-reduce over ICI automatically.
  * Metrics are returned from the jitted update and logged on the host by the
    outer loop (the reference pushes them through io_callback to wandb).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from ..envs.marl import MarlEnv
from ..envs import spaces as spaces_mod
from .networks import ActorCriticRNN, ScannedRNN


class Transition(NamedTuple):
    """(reference :368-377)"""
    global_done: jnp.ndarray
    done: jnp.ndarray
    action: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    log_prob: jnp.ndarray
    obs: jnp.ndarray
    info: Any


def batchify(x: jnp.ndarray, num_actors):
    return x.reshape((num_actors, -1))


def unbatchify(x: jnp.ndarray, num_envs, num_agents):
    return x.reshape((num_envs, num_agents, -1))


def default_train_config(**overrides) -> Dict[str, Any]:
    """Hyperparameters mirroring config/rl_configs/ippo_rnn_JAXMARL_2player
    .yaml (per-type lists)."""
    cfg = {
        "SEED": 42,
        "NUM_ENVS": 16,
        "NUM_STEPS": 32,
        "TOTAL_TIMESTEPS": 16 * 32 * 4,
        "NUM_MINIBATCHES": 2,
        "UPDATE_EPOCHS": 2,
        "FC_DIM_SIZE": 64,
        "GRU_HIDDEN_DIM": 64,
        "CLIP_EPS": 0.2,
        "SCALE_CLIP_EPS": False,
        "AUTOREGRESSIVE": False,
        # "bfloat16" runs network matmuls on the MXU in bf16 (params, GRU
        # carry, logits, values stay f32); "float32" is reference-exact
        "NETWORK_DTYPE": "float32",
        # split the rollout's env batch into N sequential lax.map chunks
        # per step. Bit-identical (per-env math untouched); the exact/cap16
        # engine measures +12% at 4096 envs with 2, psort prefers 1
        # (scripts/probe_step_chunk_tpu.py)
        "ENV_CHUNKS": 1,
        # per-agent-type lists
        "LR": [2.5e-4, 2.5e-4],
        "GAMMA": [0.99, 0.99],
        "GAE_LAMBDA": [0.95, 0.95],
        "ENT_COEF": [0.01, 0.01],
        "VF_COEF": [0.5, 0.5],
        "MAX_GRAD_NORM": [0.5, 0.5],
        "ANNEAL_LR": [True, True],
    }
    cfg.update(overrides)
    # sweep grids override per-type hyperparams with scalars (reference
    # SWEEP_PARAMETERS set e.g. a single LR across types,
    # ippo_rnn_JAXMARL_2player.yaml:69-96); broadcast them back to lists
    n_types = max((len(v) for k, v in cfg.items()
                   if k in _PER_TYPE_KEYS and isinstance(v, (list, tuple))),
                  default=2)
    for k in _PER_TYPE_KEYS:
        if not isinstance(cfg[k], (list, tuple)):
            cfg[k] = [cfg[k]] * n_types
    return cfg


_PER_TYPE_KEYS = ("LR", "GAMMA", "GAE_LAMBDA", "ENT_COEF", "VF_COEF",
                  "MAX_GRAD_NORM", "ANNEAL_LR")


def _action_dims(space) -> Any:
    if isinstance(space, spaces_mod.Discrete):
        return space.n
    if isinstance(space, spaces_mod.MultiDiscrete):
        return list(space.n)
    if isinstance(space, spaces_mod.Box):
        # integer-quantity Box (e.g. fixed_prices): one categorical head per
        # dimension over [low, high]
        return [int(space.high - space.low) + 1] * int(space.shape[0])
    raise ValueError(f"Unsupported action space {space}")


def make_train(config: Dict[str, Any], env: MarlEnv, mesh=None):
    """Build the train function. If `mesh` is given, the env batch is sharded
    over its 'data' axis and parameters are replicated (multi-chip)."""
    config = dict(config)
    # ENV_CHUNKS composes with a mesh via shard-local chunking (see
    # _env_step): each device splits its LOCAL env shard into the requested
    # chunks, so no cross-device resharding occurs and per-env outputs stay
    # bit-identical (test_ippo.py::test_env_chunked_sharded_matches_
    # unsharded). On a pod each chip hosting >4096 envs wants chunking just
    # like a single chip (BASELINE.md round-4 cliff accounting).
    _n_shards = int(mesh.shape["data"]) if mesh is not None else 1
    n_types = len(env.instance_list)
    n_per_type = list(env.config.number_of_agents_per_type)
    config["NUM_ACTORS_PERTYPE"] = [n * config["NUM_ENVS"]
                                    for n in n_per_type]
    config["NUM_ACTORS_TOTAL"] = env.num_agents * config["NUM_ENVS"]
    config["NUM_UPDATES"] = int(config["TOTAL_TIMESTEPS"]
                                // config["NUM_STEPS"] // config["NUM_ENVS"])
    config["MINIBATCH_SIZES"] = [
        nact * config["NUM_STEPS"] // config["NUM_MINIBATCHES"]
        for nact in config["NUM_ACTORS_PERTYPE"]]

    action_dims = [_action_dims(sp) for sp in env.action_spaces]
    # flattened per-actor obs width: message-window spaces are rank-2
    # (n_msgs, 8) int32 and reach the network ravelled (reference net takes
    # flat vectors, ippo_rnn_JAXMARL.py:214)
    obs_dims = [int(np.prod(sp.shape)) for sp in env.observation_spaces]

    def linear_schedule(lr, count):
        frac = (1.0 - (count // (config["NUM_MINIBATCHES"]
                                 * config["UPDATE_EPOCHS"]))
                / config["NUM_UPDATES"])
        # train(num_updates=N) may run past the TOTAL_TIMESTEPS-derived
        # NUM_UPDATES (new surface vs the reference, which always loops
        # exactly NUM_UPDATES) — floor at 0 so the LR never flips sign
        return lr * jnp.maximum(frac, 0.0)

    env_params = env.default_params

    if mesh is not None:
        from ..parallel.mesh import replicate
        env_params = replicate(env_params, mesh)

    def init_state(rng):
        """Networks, optimisers, initial env states (reference :511-572)."""
        train_states: List[TrainState] = []
        hstates = []
        init_dones = []
        for i in range(n_types):
            network = ActorCriticRNN(action_dims[i], config=config)
            rng, _rng = jax.random.split(rng)
            init_x = (
                jnp.zeros((1, config["NUM_ENVS"], obs_dims[i])),
                jnp.zeros((1, config["NUM_ENVS"])),
            )
            init_h = ScannedRNN.initialize_carry(config["NUM_ENVS"],
                                                 config["GRU_HIDDEN_DIM"])
            params = network.init(_rng, init_h, init_x)
            if config["ANNEAL_LR"][i]:
                tx = optax.chain(
                    optax.clip_by_global_norm(config["MAX_GRAD_NORM"][i]),
                    optax.adam(
                        learning_rate=functools.partial(
                            linear_schedule, config["LR"][i]),
                        eps=1e-5))
            else:
                tx = optax.chain(
                    optax.clip_by_global_norm(config["MAX_GRAD_NORM"][i]),
                    optax.adam(config["LR"][i], eps=1e-5))
            train_states.append(TrainState.create(
                apply_fn=network.apply, params=params, tx=tx))
            hstates.append(ScannedRNN.initialize_carry(
                config["NUM_ACTORS_PERTYPE"][i], config["GRU_HIDDEN_DIM"]))
            init_dones.append(jnp.zeros(
                (config["NUM_ACTORS_PERTYPE"][i],), dtype=bool))

        rng, _rng = jax.random.split(rng)
        reset_rng = jax.random.split(_rng, config["NUM_ENVS"])
        obsv, env_state = jax.vmap(env.reset, in_axes=(0, None))(reset_rng,
                                                                 env_params)
        return (train_states, env_state, obsv, init_dones, hstates, rng)

    # ------------------------------------------------------------------ #

    def _env_step(runner_state, unused):
        """(reference :578-658)"""
        train_states, env_state, last_obs, last_done, h_states, rng = \
            runner_state
        rng, _rng = jax.random.split(rng)

        actions, values, log_probs = [], [], []
        new_h = list(h_states)
        for i, ts in enumerate(train_states):
            # cast at the network boundary: integer obs (messages/tokenizer
            # windows) must not drive flax dtype promotion; float obs are
            # already f32 so this is a no-op for them
            obs_i = batchify(last_obs[i],
                             config["NUM_ACTORS_PERTYPE"][i]
                             ).astype(jnp.float32)
            ac_in = (obs_i[jnp.newaxis, :], last_done[i][jnp.newaxis, :])
            h, pi, value = ts.apply_fn(ts.params, h_states[i], ac_in)
            new_h[i] = h
            values.append(value)
            # distinct sample stream per agent type (the reference seeds
            # every type's pi.sample with the same key, ippo_rnn_JAXMARL
            # .py:604, correlating exploration across types)
            action = pi.sample(seed=jax.random.fold_in(_rng, i))
            log_probs.append(pi.log_prob(action))
            action = unbatchify(action, config["NUM_ENVS"], n_per_type[i])
            # squeeze the agent/head axes only when singleton — a bare
            # .squeeze() also collapses the env axis when NUM_ENVS == 1
            # and crashes the vmapped env.step (same guard as
            # baselines.rollout)
            if action.shape[-1] == 1:
                action = action.squeeze(-1)
            if n_per_type[i] == 1 and action.ndim > 1:
                action = action.squeeze(1)
            actions.append(action)

        rng, _rng = jax.random.split(rng)
        rng_step = jax.random.split(_rng, config["NUM_ENVS"])
        vstep = jax.vmap(env.step, in_axes=(0, 0, 0, None))
        n_chunks = int(config.get("ENV_CHUNKS", 1) or 1)
        if n_chunks > 1:
            # sequential chunked env step (see ENV_CHUNKS in
            # default_train_config): bit-identical outputs, better TPU
            # pipelining for the capped exact engine. SHARD-LOCAL on a
            # mesh: the batch is viewed as (n_shards, C, local_chunk) so
            # chunk c takes rows [c*B, (c+1)*B) of every device's local
            # shard — the reshape+swap never moves an env across devices
            # (and with n_shards=1 it folds to the plain (C, N/C) view).
            ne = config["NUM_ENVS"]
            D = _n_shards
            if ne % (n_chunks * D):
                raise ValueError(
                    f"ENV_CHUNKS={n_chunks} x {D} mesh shards must divide "
                    f"NUM_ENVS={ne}")

            def resh(x):
                return x.reshape(
                    (D, n_chunks, ne // (D * n_chunks)) + x.shape[1:]
                ).swapaxes(0, 1).reshape(
                    (n_chunks, ne // n_chunks) + x.shape[1:])

            args_c = jax.tree.map(resh, (rng_step, env_state, actions))
            out = jax.lax.map(
                lambda a: vstep(a[0], a[1], a[2], env_params), args_c)

            def unchunk(x):
                return x.reshape(
                    (n_chunks, D, ne // (D * n_chunks)) + x.shape[2:]
                ).swapaxes(0, 1).reshape((ne,) + x.shape[2:])

            obsv, env_state, reward, done, info = jax.tree.map(unchunk, out)
        else:
            obsv, env_state, reward, done, info = vstep(
                rng_step, env_state, actions, env_params)

        transitions = []
        done_agents = []

        def _actor_vec(x, i):
            """(..., A, 1)-shaped per-actor arrays -> (A,); axis-preserving
            (a bare .squeeze() collapses A == 1 when NUM_ENVS == 1)."""
            return jnp.reshape(x, (config["NUM_ACTORS_PERTYPE"][i],))

        for i, ts in enumerate(train_states):
            done_i = _actor_vec(batchify(done["agents"][i],
                                         config["NUM_ACTORS_PERTYPE"][i]), i)
            done_agents.append(done_i)
            info_i = {
                "world": info["world"],
                "agent": jax.tree.map(
                    lambda x: x.reshape(config["NUM_ACTORS_PERTYPE"][i], -1),
                    info["agents"][i]),
            }
            transitions.append(Transition(
                # env-major actor layout (batchify reshapes (envs, agents)),
                # so the episode mask must be repeat, not tile — tile would
                # hand actor j env j%NUM_ENVS's done flag whenever a type has
                # >1 instance, corrupting GAE episode boundaries (the
                # reference has the same tile bug, ippo_rnn_JAXMARL.py:649)
                jnp.repeat(done["__all__"], n_per_type[i]),
                last_done[i],
                # Discrete actions flatten to (A,); MultiDiscrete keep
                # their (A, K) head axis
                (lambda a: a.squeeze(-1) if a.shape[-1] == 1 else a)(
                    batchify(actions[i], config["NUM_ACTORS_PERTYPE"][i])),
                _actor_vec(values[i], i),
                _actor_vec(batchify(reward[i],
                                    config["NUM_ACTORS_PERTYPE"][i]), i),
                _actor_vec(log_probs[i], i),
                batchify(last_obs[i], config["NUM_ACTORS_PERTYPE"][i]
                         ).astype(jnp.float32),
                info_i,
            ))
        runner_state = (train_states, env_state, obsv, done_agents, new_h,
                        rng)
        return runner_state, transitions

    def _calculate_gae(gamma, gae_lambda, traj_batch, last_val):
        """(reference :668-690)"""
        def _get_advantages(gae_and_next, transition):
            gae, next_value = gae_and_next
            done, value, reward = (transition.global_done, transition.value,
                                   transition.reward)
            delta = reward + gamma * next_value * (1 - done) - value
            gae = delta + gamma * gae_lambda * (1 - done) * gae
            return (gae, value), gae

        _, advantages = jax.lax.scan(
            _get_advantages, (jnp.zeros_like(last_val), last_val),
            traj_batch, reverse=True, unroll=16)
        return advantages, advantages + traj_batch.value

    def _update_step(update_runner_state, unused):
        """One rollout + PPO update as a single XLA program
        (reference :575-875)."""
        runner_state, update_steps = update_runner_state
        initial_hstates = runner_state[-2]
        runner_state, traj_batch = jax.lax.scan(
            _env_step, runner_state, None, config["NUM_STEPS"])

        train_states, env_state, last_obs, last_dones, hstates_new, rng = \
            runner_state

        advantages, targets = [], []
        for i, ts in enumerate(train_states):
            last_obs_b = batchify(last_obs[i],
                                  config["NUM_ACTORS_PERTYPE"][i]
                                  ).astype(jnp.float32)
            ac_in = (last_obs_b[jnp.newaxis, :],
                     last_dones[i][jnp.newaxis, :])
            _, _, last_val = ts.apply_fn(ts.params, hstates_new[i], ac_in)
            adv_i, tgt_i = _calculate_gae(
                config["GAMMA"][i], config["GAE_LAMBDA"][i], traj_batch[i],
                last_val.squeeze(0))
            advantages.append(adv_i)
            targets.append(tgt_i)

        loss_infos = []
        train_states = list(train_states)
        # advance the carried key past the update phase and give each type
        # its own permutation stream: the reference re-enters the next
        # rollout with the SAME key its epoch scan just consumed for
        # minibatch permutation (ippo_rnn_JAXMARL.py:1069), correlating data
        # shuffling with subsequent action sampling
        rng, perm_rng = jax.random.split(rng)
        for i in range(n_types):
            def _update_epoch(update_state, unused, i=i):
                def _update_minbatch(train_state, batch_info):
                    init_hstate, traj_b, adv, tgt = batch_info

                    def _loss_fn(params, init_hstate, traj_b, gae, tgt):
                        _, pi, value = train_state.apply_fn(
                            # squeeze ONLY the leading broadcast axis: a
                            # bare .squeeze() also collapses the actor axis
                            # when a minibatch holds a single actor,
                            # crashing the GRU carry reset
                            params, init_hstate.squeeze(0),
                            (traj_b.obs, traj_b.done))
                        log_prob = pi.log_prob(traj_b.action)
                        value_pred_clipped = traj_b.value + (
                            value - traj_b.value
                        ).clip(-config["CLIP_EPS"], config["CLIP_EPS"])
                        value_losses = jnp.square(value - tgt)
                        value_losses_clipped = jnp.square(
                            value_pred_clipped - tgt)
                        value_loss = 0.5 * jnp.maximum(
                            value_losses, value_losses_clipped).mean()

                        logratio = log_prob - traj_b.log_prob
                        ratio = jnp.exp(logratio)
                        gae = (gae - gae.mean()) / (gae.std() + 1e-8)
                        loss_actor1 = ratio * gae
                        loss_actor2 = jnp.clip(
                            ratio, 1.0 - config["CLIP_EPS"],
                            1.0 + config["CLIP_EPS"]) * gae
                        loss_actor = -jnp.minimum(loss_actor1,
                                                  loss_actor2).mean()
                        entropy = pi.entropy().mean()
                        approx_kl = ((ratio - 1) - logratio).mean()
                        clip_frac = jnp.mean(
                            jnp.abs(ratio - 1) > config["CLIP_EPS"])
                        total_loss = (loss_actor
                                      + config["VF_COEF"][i] * value_loss
                                      - config["ENT_COEF"][i] * entropy)
                        return total_loss, (value_loss, loss_actor, entropy,
                                            ratio.mean(), approx_kl,
                                            clip_frac)

                    grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
                    total_loss, grads = grad_fn(train_state.params,
                                                init_hstate, traj_b, adv,
                                                tgt)
                    train_state = train_state.apply_gradients(grads=grads)
                    return train_state, total_loss

                (train_state, init_hstate, traj_b, adv, tgt, rng) = \
                    update_state
                rng, _rng = jax.random.split(rng)
                init_hstate_r = jnp.reshape(
                    init_hstate, (1, config["NUM_ACTORS_PERTYPE"][i], -1))
                # axis-preserving reshape, NOT .squeeze(): with
                # NUM_ACTORS_PERTYPE == 1 a bare squeeze collapses (T, 1)
                # to (T,) and the permutation take(axis=1) below errors
                # (same hazard as the init_hstate squeeze(0) fix)
                n_act = config["NUM_ACTORS_PERTYPE"][i]
                batch = (init_hstate_r, traj_b,
                         jnp.reshape(adv, (adv.shape[0], n_act)),
                         jnp.reshape(tgt, (tgt.shape[0], n_act)))
                permutation = jax.random.permutation(
                    _rng, config["NUM_ACTORS_PERTYPE"][i])
                shuffled = jax.tree.map(
                    lambda x: jnp.take(x, permutation, axis=1), batch)
                minibatches = jax.tree.map(
                    lambda x: jnp.swapaxes(
                        jnp.reshape(
                            x, [x.shape[0], config["NUM_MINIBATCHES"], -1]
                            + list(x.shape[2:])), 1, 0),
                    shuffled)
                train_state, total_loss = jax.lax.scan(
                    _update_minbatch, train_state, minibatches)
                return (train_state, init_hstate, traj_b, adv, tgt, rng), \
                    total_loss

            # the loss reads obs/done/action/value/log_prob only — strip the
            # (large) info tree AND the unused reward/global_done arrays
            # before the per-epoch permutation gather so they aren't
            # shuffled through every minibatch (reward feeds GAE/metrics
            # from the unstripped traj_batch; global_done fed GAE already)
            update_state = (train_states[i], initial_hstates[i],
                            traj_batch[i]._replace(info=None, reward=None,
                                                   global_done=None),
                            advantages[i], targets[i],
                            jax.random.fold_in(perm_rng, i))
            update_state, loss_info = jax.lax.scan(
                _update_epoch, update_state, None, config["UPDATE_EPOCHS"])
            train_states[i] = update_state[0]
            loss_infos.append(loss_info)

        metrics = {"loss": [], "avg_reward": [], "agents": [], "world": []}
        for i, loss_info in enumerate(loss_infos):
            li = jax.tree.map(lambda x: x.mean(), loss_info)
            metrics["loss"].append({
                "total_loss": li[0],
                "value_loss": li[1][0],
                "actor_loss": li[1][1],
                "entropy": li[1][2],
                "ratio": li[1][3],
                "approx_kl": li[1][4],
                "clip_frac": li[1][5],
            })
            metrics["avg_reward"].append(jnp.mean(traj_batch[i].reward))
            metrics["agents"].append(jax.tree.map(
                lambda x: jnp.mean(jnp.asarray(x, jnp.float32)),
                traj_batch[i].info["agent"]))
        metrics["world"] = jax.tree.map(
            lambda x: jnp.mean(jnp.asarray(x, jnp.float32)),
            traj_batch[0].info["world"])

        runner_state = (tuple(train_states), env_state, last_obs, last_dones,
                        hstates_new, rng)
        return (runner_state, update_steps + 1), metrics

    # ------------------------------------------------------------------ #

    # donate the carry: the runner state (env states, hstates, params, opt
    # state) is dead after each update, so XLA reuses its buffers in place
    # instead of allocating a second copy — relieves HBM pressure at 4096+
    # envs (the >4096 cliff is an XLA temp blowup, BASELINE.md round-4).
    # Callers never reuse the donated argument (the train loop reassigns).
    update_step_jit = jax.jit(lambda urs: _update_step(urs, None),
                              donate_argnums=0)

    # Chunked update loop: lax.scan over K update steps inside ONE jitted
    # program. The reference's outer Python loop (ippo_rnn_JAXMARL.py:1099)
    # costs one host round-trip per update to fetch metrics — through a
    # remote-TPU tunnel that is a flat ~60 ms, ~7% of an update. Scanning K
    # updates amortises it to one fetch per chunk; the math is the identical
    # _update_step sequence, so results are bit-equal to the looped path
    # (tests/test_ippo.py::test_chunked_updates_match_looped).
    _chunk_jits: Dict[int, Any] = {}

    def _canon_carry(update_runner_state):
        """Match the container types _update_step outputs (train_states
        tuple, the rest lists, update_steps an int32 array) so the carry
        pytree structure is scan-stable; init_state hands back lists."""
        (ts, es, obs, dn, hs, rng), us = update_runner_state
        return ((tuple(ts), es, list(obs), list(dn), list(hs), rng),
                jnp.asarray(us, jnp.int32))

    def _chunk_jit(n: int):
        if n not in _chunk_jits:
            _chunk_jits[n] = jax.jit(
                lambda urs, n=n: jax.lax.scan(_update_step, urs, None,
                                              length=n),
                donate_argnums=0)
        return _chunk_jits[n]

    _eval_jits: Dict[Any, Any] = {}

    def _eval_rollout(eval_env, train_states, rng, n_envs, n_steps):
        """Policy rollout on the eval env; returns per-type mean rewards
        (reference: the CALC_EVAL on-device eval scan,
        ippo_rnn_JAXMARL.py:876-975, here run between updates). Set
        EVAL_DETERMINISTIC: true in the RL config for greedy (mode) actions
        instead of sampling — an addition over the reference.

        The jitted rollout is cached with the network params as ARGUMENTS:
        rebuilding policies per call would bake each update's params into
        the jaxpr as constants and recompile every periodic eval (45-600 s
        each through the TPU tunnel)."""
        from .baselines import LearnedPolicy, rollout
        from .networks import ActorCriticRNN
        deterministic = bool(config.get("EVAL_DETERMINISTIC", False))
        ck = (id(eval_env), n_envs, n_steps, deterministic)
        if ck not in _eval_jits:
            nets = [ActorCriticRNN(_action_dims(eval_env.action_spaces[i]),
                                   config=config)
                    for i in range(len(eval_env.instance_list))]

            def _run(params_list, seed):
                policies = [
                    LearnedPolicy(nets[i], params_list[i],
                                  deterministic=deterministic)
                    for i in range(len(nets))]
                rewards, _dones, _infos, _acts = rollout(
                    eval_env, policies, n_envs, n_steps, seed=seed,
                    gru_dim=config["GRU_HIDDEN_DIM"])
                return [jnp.mean(r) for r in rewards]

            _eval_jits[ck] = jax.jit(_run)
        means = _eval_jits[ck](
            [ts.params for ts in train_states],
            jax.random.randint(rng, (), 0, 2**20))
        return {"eval_avg_reward": [float(m) for m in means]}

    def train(rng, *, num_updates=None, log_fn=None, checkpoint_manager=None,
              eval_env=None, eval_every: int = 10, eval_envs: int = 8,
              eval_steps: int = 32, resume_from=None,
              full_checkpoints: bool = False, chunk: int = 1):
        """Outer host loop over jitted update steps (reference :1099-1133);
        optional periodic held-out evaluation when `eval_env` is given.

        `resume_from` (a CheckpointManager with a full-resume checkpoint)
        continues training bit-exactly where it stopped — params, optimizer
        state, env states, hidden states, and PRNG all restored; the
        reference can only restore params for evaluation.
        `full_checkpoints=True` saves such resumable checkpoints (the
        eval-compatible 'model' key is included either way).

        `chunk > 1` scans that many update steps inside one jitted program
        (host sync, logging fetch, eval, and checkpointing then happen at
        chunk boundaries; per-update metrics are still logged from the
        stacked chunk output). Bit-identical to chunk=1."""
        num_updates = num_updates or config["NUM_UPDATES"]
        runner_state = init_state(rng)
        # decorrelate the host-side eval-key stream from init_state's split
        # chain (both otherwise consume the same `rng`, so the first eval key
        # would bitwise-duplicate a network-init key)
        rng = jax.random.fold_in(rng, 0x6576616C)  # "eval"
        start_step = 0
        if resume_from is not None and resume_from.latest_step() is not None:
            from .checkpoint import restore_train_checkpoint
            runner_state, start_step = restore_train_checkpoint(
                resume_from, runner_state)
        if mesh is not None:
            from ..parallel.mesh import shard_runner_state
            runner_state = shard_runner_state(runner_state, mesh)
        # Canonicalise once: update_steps as a committed int32 array (a
        # Python int here makes call #2 retrace the whole update program —
        # int-weak-typed carry in, array out) and container types matching
        # _update_step's output so the chunked scan carry is structure-stable.
        update_runner_state = _canon_carry((runner_state, start_step))
        all_metrics = []

        def _post_update(step, metrics, is_boundary):
            """Per-update host work; eval/checkpoint only at boundaries
            (every update when chunk=1)."""
            nonlocal rng
            if (eval_env is not None and is_boundary
                    and (step + 1) % eval_every == 0):
                rng, ek = jax.random.split(rng)
                metrics.update(_eval_rollout(
                    eval_env, update_runner_state[0][0], ek, eval_envs,
                    eval_steps))
            all_metrics.append(metrics)
            if log_fn is not None:
                log_fn(step, metrics)
            if checkpoint_manager is not None and is_boundary:
                if full_checkpoints:
                    from .checkpoint import save_train_checkpoint
                    save_train_checkpoint(checkpoint_manager, step,
                                          update_runner_state[0], metrics)
                else:
                    from .checkpoint import save_checkpoint
                    save_checkpoint(checkpoint_manager, step,
                                    update_runner_state[0][0], metrics)

        step = start_step
        while step < num_updates:
            n = min(max(int(chunk), 1), num_updates - step)
            if n == 1:
                update_runner_state, metrics = update_step_jit(
                    update_runner_state)
                _post_update(step, jax.device_get(metrics), True)
            else:
                update_runner_state, stacked = _chunk_jit(n)(
                    update_runner_state)
                stacked = jax.device_get(stacked)
                for j in range(n):
                    _post_update(step + j,
                                 jax.tree.map(lambda x: x[j], stacked),
                                 j == n - 1)
            step += n
        return {"runner_state": update_runner_state[0],
                "metrics": all_metrics, "config": config}

    train.init_state = init_state
    train.update_step = _update_step
    train.config = config
    train.env_params = env_params
    return train
