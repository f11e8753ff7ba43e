"""OO book wrapper, checkpointing, logging, and utility tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from jaxmarl_hft_tpu.config.structs import LobConfig
from jaxmarl_hft_tpu.lob.book import LobState, OrderBook
from jaxmarl_hft_tpu.utils.tree import (clip_by_sum_int,
                                        hamilton_apportionment_permuted_jax,
                                        index_tree, tree_stack, tree_unstack)


def test_orderbook_wrapper_roundtrip():
    """Mirrors the reference's jorderbook __main__ smoke test
    (jorderbook.py:288-318): build from L2, process dict + array messages,
    query best prices and the L2 view."""
    ob = OrderBook(LobConfig(nOrders=20, nTrades=20))
    l2 = jnp.array([2200000, 50, 2190000, 40,
                    2210000, 30, 2180000, 20], dtype=jnp.int32)
    state = ob.reset(l2)
    best_ask, best_bid = ob.get_best_bid_and_ask(state)
    assert int(best_ask) == 2200000 and int(best_bid) == 2190000

    state = ob.process_order(state, {
        "type": "limit", "side": "bid", "quantity": 10, "price": 2195000,
        "trade_id": 901, "order_id": 901, "timestamp": "34200.000000001"})
    assert int(ob.get_best_bid(state)) == 2195000

    # aggressive array message crosses the best ask
    msg = jnp.array([1, 1, 60, 2205000, 902, 902, 34201, 0], jnp.int32)
    state = ob.process_order_array(state, msg)
    trades = np.asarray(state.trades)
    real = trades[trades[:, 0] > 0]
    assert real.shape[0] >= 1
    assert (np.abs(real[:, 1]).sum()) >= 50  # at least the top level filled

    l2_after = np.asarray(ob.get_L2_state(state, 2))
    assert l2_after.shape == (8,)

    state2, l2_hist = ob.process_orders_array_l2(
        state, jnp.array([[1, -1, 5, 2209000, 903, 903, 34202, 0]],
                         jnp.int32), 2)
    assert l2_hist.shape == (1, 8)


def test_tree_utils():
    trees = [{"a": jnp.ones(2) * i, "b": jnp.zeros(3) + i} for i in range(4)]
    stacked = tree_stack(trees)
    assert stacked["a"].shape == (4, 2)
    unstacked = tree_unstack(stacked)
    assert len(unstacked) == 4
    np.testing.assert_array_equal(np.asarray(index_tree(stacked, 2)["a"]),
                                  np.asarray(trees[2]["a"]))


def test_clip_by_sum_int():
    out = clip_by_sum_int(jnp.array([3, 2, 3, 1]), 8)
    np.testing.assert_array_equal(np.asarray(out), [3, 2, 2, 1])
    out = clip_by_sum_int(jnp.array([1, 1]), 8)
    np.testing.assert_array_equal(np.asarray(out), [1, 1])


def test_hamilton_apportionment():
    votes = jnp.array([10.0, 20.0, 30.0, 40.0])
    seats = hamilton_apportionment_permuted_jax(votes, 10,
                                                jax.random.PRNGKey(0))
    assert int(jnp.sum(seats)) == 10


def test_checkpoint_roundtrip(tmp_path):
    from flax.training.train_state import TrainState
    import optax
    from jaxmarl_hft_tpu.rl.checkpoint import (make_checkpoint_manager,
                                               restore_checkpoint,
                                               save_checkpoint)
    from jaxmarl_hft_tpu.rl.networks import ActorCriticRNN, ScannedRNN

    net = ActorCriticRNN(4, config={"FC_DIM_SIZE": 8, "GRU_HIDDEN_DIM": 8})
    h = ScannedRNN.initialize_carry(2, 8)
    x = (jnp.zeros((1, 2, 3)), jnp.zeros((1, 2)))
    params = net.init(jax.random.PRNGKey(0), h, x)
    ts = TrainState.create(apply_fn=net.apply, params=params,
                           tx=optax.adam(1e-3))

    mgr = make_checkpoint_manager(str(tmp_path / "ckpt"))
    save_checkpoint(mgr, 0, [ts])
    restored = restore_checkpoint(mgr)
    r_params = restored["model"][0]
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         jax.device_get(params), r_params)
    assert max(jax.tree.leaves(diffs)) == 0.0


def test_metrics_logger(tmp_path):
    from jaxmarl_hft_tpu.utils.logging import MetricsLogger, Throughput
    p = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(p)
    lg.log(0, {"loss": jnp.asarray(1.5), "nested": {"x": np.float32(2.0)}})
    lg.close()
    import json
    row = json.loads(open(p).read().strip())
    assert row["loss"] == 1.5 and row["nested"]["x"] == 2.0

    tp = Throughput()
    assert tp.update(100) > 0


def test_metrics_logger_wandb_passthrough(tmp_path, monkeypatch):
    """use_wandb=True mirrors every payload to wandb.log with the step —
    exercised against a stub module (the reference logs through WandB via
    io_callback, ippo_rnn_JAXMARL.py:1067; here the mirror is host-side)."""
    import sys
    import types

    from jaxmarl_hft_tpu.utils.logging import MetricsLogger

    calls = {"init": [], "log": [], "finish": 0}
    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: calls["init"].append(kw)
    stub.log = lambda metrics, step=None: calls["log"].append((step,
                                                               metrics))
    def _fin():
        calls["finish"] += 1
    stub.finish = _fin
    monkeypatch.setitem(sys.modules, "wandb", stub)

    p = str(tmp_path / "w.jsonl")
    lg = MetricsLogger(p, use_wandb=True,
                       wandb_kwargs={"project": "jaxmarl-hft-tpu"})
    lg.log(3, {"loss": jnp.asarray(0.25), "reward": [np.float32(1.0)]})
    lg.log(4, {"loss": jnp.asarray(0.125)})
    lg.close()

    assert calls["init"] == [{"project": "jaxmarl-hft-tpu"}]
    assert calls["finish"] == 1
    assert [s for s, _ in calls["log"]] == [3, 4]
    assert calls["log"][0][1]["loss"] == 0.25
    assert calls["log"][0][1]["reward"] == [1.0]
    # the JSONL sink still receives both rows
    import json
    rows = [json.loads(l) for l in open(p)]
    assert [r["step"] for r in rows] == [3, 4]
