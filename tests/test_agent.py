"""Unit tests: networks, policy, replay buffer, Double-DQN learner."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from t48.agent import learner, networks, policy
from t48.replay import buffer


def _count_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


class TestNetworks:
    def test_dense_shapes_and_param_count(self):
        net = networks.DenseQNet()
        x = jnp.zeros((7, 16), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x)
        assert out.shape == (7, 4)
        # 16*512+512 + 512*512+512 + 512*256+256 + 256*4+4
        expect = (16 * 512 + 512) + (512 * 512 + 512) + (512 * 256 + 256) + (
            256 * 4 + 4
        )
        assert _count_params(params) == expect

    def test_conv_shapes_and_param_count(self):
        net = networks.ConvQNet()
        x = jnp.zeros((3, 4, 4, 1), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x)
        assert out.shape == (3, 4)
        # conv1 1*64*2*2+64, conv2 64*64*2*2+64, fc 256*64+64, head 64*4+4
        expect = (1 * 64 * 4 + 64) + (64 * 64 * 4 + 64) + (256 * 64 + 64) + (
            64 * 4 + 4
        )
        assert _count_params(params) == expect

    def test_build_network(self):
        assert isinstance(networks.build_network("dense"), networks.DenseQNet)
        assert isinstance(networks.build_network("conv"), networks.ConvQNet)
        with pytest.raises(ValueError):
            networks.build_network("transformer")


class TestPolicy:
    def test_greedy_respects_legality_mask(self):
        q = jnp.array([[10.0, 1.0, 0.5, 0.1]])
        legal = jnp.array([[False, True, True, True]])
        a = policy.greedy_masked_action(q, legal)
        assert int(a[0]) == 1

    def test_reference_compat_formula(self):
        # Qn = Q - min*max - min; argmax over legal * Qn
        q = jnp.array([[2.0, 1.0, -1.0, 0.0]])
        legal = jnp.array([[True, True, True, True]])
        qmin, qmax = -1.0, 2.0
        qn = np.array([2.0, 1.0, -1.0, 0.0]) - qmin * qmax - qmin
        expect = int(np.argmax(qn))
        a = policy.greedy_masked_action(q, legal, compat="reference")
        assert int(a[0]) == expect

    def test_epsilon_one_is_uniform_and_can_pick_illegal(self):
        """ε=1 draws uniformly over all 4 actions, legality ignored
        (dqn_lib.py:20-21)."""
        q = jnp.zeros((4000, 4))
        legal = jnp.tile(jnp.array([[True, False, False, False]]), (4000, 1))
        actions, max_q = policy.epsilon_greedy(
            jax.random.PRNGKey(0), q, legal, jnp.float32(1.0)
        )
        counts = np.bincount(np.asarray(actions), minlength=4)
        assert (counts > 800).all()  # all four actions occur ~uniformly
        assert (np.asarray(max_q) == 0).all()  # random branch reports q=0

    def test_epsilon_zero_is_greedy(self):
        q = jnp.array([[0.0, 5.0, 1.0, 2.0]] * 10)
        legal = jnp.ones((10, 4), bool)
        actions, max_q = policy.epsilon_greedy(
            jax.random.PRNGKey(1), q, legal, jnp.float32(0.0)
        )
        assert (np.asarray(actions) == 1).all()
        assert (np.asarray(max_q) == 5.0).all()


class TestReplayBuffer:
    def _tr(self, n, base=0):
        return buffer.Transition(
            state=jnp.full((n, 16), base, jnp.int8),
            action=jnp.arange(n, dtype=jnp.int32) % 4,
            reward=jnp.full((n,), float(base), jnp.float32),
            next_state=jnp.full((n, 16), base + 1, jnp.int8),
            done=jnp.zeros((n,), bool),
        )

    def test_insert_and_fill(self):
        # env_batch=1: one ring, exact reference deque semantics
        rs = buffer.create(capacity=10)
        rs = buffer.add_many(rs, self._tr(4, base=1))
        assert int(rs.fill) == 4 and int(rs.ptr) == 4
        rs = buffer.add_many(rs, self._tr(4, base=2))
        assert int(rs.fill) == 8 and int(rs.ptr) == 8

    def test_circular_eviction(self):
        """At capacity the oldest entries are overwritten, like a deque
        with maxlen (dqn_lib.py:172)."""
        rs = buffer.create(capacity=6)
        rs = buffer.add_many(rs, self._tr(4, base=1))
        rs = buffer.add_many(rs, self._tr(4, base=2))  # wraps: slots 4,5,0,1
        assert int(rs.fill) == 6 and int(rs.ptr) == 2
        rewards = np.asarray(rs.reward)[0]
        assert list(rewards) == [2.0, 2.0, 1.0, 1.0, 2.0, 2.0]

    def test_sampling_respects_fill(self):
        rs = buffer.create(capacity=100)
        rs = buffer.add_many(rs, self._tr(5, base=3))
        batch = buffer.sample(rs, jax.random.PRNGKey(0), 64)
        assert (np.asarray(batch.reward) == 3.0).all()
        # cell-major factored batch: [cells, draws, envs]
        assert batch.state.shape == (16, 64, 1)

    def test_sampling_uniform_with_replacement(self):
        rs = buffer.create(capacity=8)
        for i in range(8):
            tr = self._tr(1, base=i)
            rs = buffer.add_many(rs, tr)
        batch = buffer.sample(rs, jax.random.PRNGKey(1), 8000)
        counts = np.bincount(np.asarray(batch.reward).ravel().astype(int), minlength=8)
        assert (np.abs(counts / 8000 - 1 / 8) < 0.03).all()

    def test_per_env_rings(self):
        """env_batch>1: each env owns a sub-ring; lockstep add_step writes
        one transition per ring; sampling is stratified per env."""
        rs = buffer.create(capacity=16, env_batch=4)
        assert rs.per_env_capacity == 4 and rs.capacity == 16
        for step in range(3):
            tr = buffer.Transition(
                state=jnp.full((4, 16), step, jnp.int8),
                action=jnp.full((4,), step % 4, jnp.int32),
                reward=jnp.arange(4, dtype=jnp.float32) * 10 + step,
                next_state=jnp.full((4, 16), step + 1, jnp.int8),
                done=jnp.zeros((4,), bool),
            )
            rs = buffer.add_step(rs, tr)
        assert int(rs.fill) == 3 and int(rs.ptr) == 3
        assert int(rs.total_fill) == 12
        # env e's ring holds only its own rewards (10e, 10e+1, 10e+2)
        rewards = np.asarray(rs.reward)
        for e in range(4):
            assert set(rewards[e, :3]) == {10 * e, 10 * e + 1, 10 * e + 2}
        # stratified sample: 8 draws → 2 per env, all from that env's
        # ring; sampled rows flatten in (draw, env) order
        batch = buffer.sample(rs, jax.random.PRNGKey(0), 8)
        r = np.asarray(batch.reward).reshape(2, 4)
        for e in range(4):
            assert (r[:, e] // 10 == e).all()

    def test_add_many_pads_by_cycling(self):
        """Bulk seed of T % B != 0 transitions pads by cycling from the
        start so every ring stays balanced."""
        rs = buffer.create(capacity=20, env_batch=4)
        rs = buffer.add_many(rs, self._tr(6, base=1))  # 6 → 2 steps of 4
        assert int(rs.fill) == 2
        assert int(rs.total_fill) == 8
        # capacity rounds up: ceil(20/4)=5 per env
        assert rs.per_env_capacity == 5

    def test_effective_sample_rounding(self):
        assert buffer.sample_rows(5000, 1) == 5000
        assert buffer.sample_rows(5000, 1024) == 5
        assert buffer.sample_rows(32, 8) == 4
        assert buffer.sample_rows(2, 8) == 1  # floor at 1 per env


class TestLearner:
    def _setup(self, use_double_dqn=True, compat_zero_update=False):
        net = networks.DenseQNet(hidden=(32,))
        encode = lambda s: s.astype(jnp.float32)
        x = jnp.zeros((2, 16), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        target_params = jax.tree_util.tree_map(jnp.copy, params)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        step = learner.make_train_step(
            net.apply, encode, opt, 0.9, use_double_dqn, compat_zero_update
        )
        return net, encode, params, target_params, opt, opt_state, step

    def _batch(self, n=32):
        k = jax.random.PRNGKey(7)
        return buffer.Transition(
            state=jax.random.randint(k, (n, 16), 0, 8).astype(jnp.int8),
            action=jax.random.randint(jax.random.fold_in(k, 1), (n,), 0, 4),
            reward=jax.random.uniform(jax.random.fold_in(k, 2), (n,)) * 8,
            next_state=jax.random.randint(jax.random.fold_in(k, 3), (n, 16), 0, 8).astype(jnp.int8),
            done=jax.random.bernoulli(jax.random.fold_in(k, 4), 0.1, (n,)),
        )

    def test_double_dqn_target_formula(self):
        """Hand-computed Double-DQN target on a tiny fabricated case."""
        q_online = jnp.array([[1.0, 3.0, 2.0, 0.0]])
        q_target = jnp.array([[5.0, 7.0, 6.0, 4.0]])

        def apply_fn(params, x):
            return q_online if params == "online" else q_target

        batch = buffer.Transition(
            state=jnp.zeros((1, 16), jnp.int8),
            action=jnp.array([0]),
            reward=jnp.array([2.0]),
            next_state=jnp.zeros((1, 16), jnp.int8),
            done=jnp.array([False]),
        )
        y = learner.double_dqn_targets(
            apply_fn, "online", "target", lambda s: s, batch, 0.5
        )
        # argmax online = action 1 → Q_target[1] = 7 → y = 2 + 0.5*7 = 5.5
        assert float(y[0]) == pytest.approx(5.5)
        # done masks the bootstrap term
        batch_done = batch._replace(done=jnp.array([True]))
        y_done = learner.double_dqn_targets(
            apply_fn, "online", "target", lambda s: s, batch_done, 0.5
        )
        assert float(y_done[0]) == pytest.approx(2.0)

    def test_vanilla_target_formula(self):
        q_target = jnp.array([[5.0, 7.0, 6.0, 4.0]])
        apply_fn = lambda params, x: q_target
        batch = buffer.Transition(
            state=jnp.zeros((1, 16), jnp.int8),
            action=jnp.array([2]),
            reward=jnp.array([1.0]),
            next_state=jnp.zeros((1, 16), jnp.int8),
            done=jnp.array([False]),
        )
        y = learner.vanilla_dqn_targets(apply_fn, None, "t", lambda s: s, batch, 0.8)
        assert float(y[0]) == pytest.approx(1.0 + 0.8 * 7.0)

    def test_loss_is_sum_reduced(self):
        """Doubling the batch (by concat) doubles the loss (MSE-sum)."""
        net, encode, params, target_params, opt, opt_state, step = self._setup()
        b1 = self._batch(16)
        b2 = buffer.Transition(*(jnp.concatenate([x, x]) for x in b1[:5]))
        l1 = learner.td_loss(net.apply, params, target_params, encode, b1, 0.9)
        l2 = learner.td_loss(net.apply, params, target_params, encode, b2, 0.9)
        assert float(l2) == pytest.approx(2 * float(l1), rel=1e-5)

    def test_train_step_reduces_loss(self):
        net, encode, params, target_params, opt, opt_state, step = self._setup()
        batch = self._batch(64)
        jit_step = jax.jit(step)
        out = jit_step(params, target_params, opt_state, batch)
        first = float(out.loss)
        params, opt_state = out.params, out.opt_state
        for _ in range(30):
            out = jit_step(params, target_params, opt_state, batch)
            params, opt_state = out.params, out.opt_state
        assert float(out.loss) < first

    def test_compat_zero_update_freezes_params(self):
        """The reference-ordering-bug emulation applies (near-)zero updates.

        Adam on a zero gradient with zero moments produces exactly zero
        update, so params must be bit-identical.
        """
        net, encode, params, target_params, opt, opt_state, step = self._setup(
            compat_zero_update=True
        )
        out = jax.jit(step)(params, target_params, opt_state, self._batch(8))
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(out.params)
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))



class TestCellMajor:
    """The cell-major hot-loop kernels match their batch-major twins."""

    def test_cm_forward_matches_flax(self):
        from t48.agent import cm_forward
        from t48.train.loop import encoder_for

        for arch in ("dense", "conv"):
            net = networks.build_network(arch)
            enc = encoder_for(arch, 4)
            x = jax.random.randint(
                jax.random.PRNGKey(0), (64, 16), 0, 12
            ).astype(jnp.int8)
            params = net.init(jax.random.PRNGKey(1), enc(x))
            q_flax = net.apply(params, enc(x))  # [B, 4]
            q_cm = cm_forward.build_cm_forward(arch)(
                params, x.astype(jnp.int32).T
            )  # [4, B]
            np.testing.assert_allclose(
                np.asarray(q_cm.T), np.asarray(q_flax), rtol=2e-5, atol=2e-5
            )

    def test_cm_forward_bf16_runs(self):
        from t48.agent import cm_forward
        from t48.train.loop import encoder_for

        net = networks.build_network("conv")
        enc = encoder_for("conv", 4)
        x = jnp.zeros((8, 16), jnp.int8)
        params = net.init(jax.random.PRNGKey(0), enc(x))
        q = cm_forward.build_cm_forward("conv", jnp.bfloat16)(
            params, x.astype(jnp.int32).T
        )
        assert q.shape == (4, 8) and q.dtype == jnp.bfloat16

    def test_epsilon_greedy_cm_matches(self):
        for compat in ("masked", "reference"):
            k = jax.random.PRNGKey(3)
            q = jax.random.normal(k, (128, 4))
            legal = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.7, (128, 4))
            legal = legal.at[:, 0].set(True)  # no all-illegal rows
            for eps in (0.0, 0.5):
                a1, q1 = policy.epsilon_greedy(k, q, legal, eps, compat)
                a2, q2 = policy.epsilon_greedy_cm(k, q.T, legal.T, eps, compat)
                assert np.array_equal(np.asarray(a1), np.asarray(a2))
                np.testing.assert_allclose(np.asarray(q1), np.asarray(q2))

    def test_select_action_cm(self):
        from t48.agent.learner import _select_action, _select_action_cm

        q = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
        a = jax.random.randint(jax.random.PRNGKey(1), (32,), 0, 4)
        np.testing.assert_allclose(
            np.asarray(_select_action(q, a)),
            np.asarray(_select_action_cm(q.T, a)),
        )

    def test_cm_train_step_matches_batch_major(self):
        """One learner update, cm vs batch-major paths: same loss and
        same updated params (float tolerance)."""
        from t48.agent import cm_forward, learner
        from t48.train.loop import encoder_for

        net = networks.build_network("conv")
        enc = encoder_for("conv", 4)
        n = 64
        k = jax.random.PRNGKey(9)
        tr = buffer.Transition(
            state=jax.random.randint(k, (n, 16), 0, 8).astype(jnp.int8),
            action=jax.random.randint(jax.random.fold_in(k, 1), (n,), 0, 4),
            reward=jax.random.uniform(jax.random.fold_in(k, 2), (n,)) * 8,
            next_state=jax.random.randint(
                jax.random.fold_in(k, 3), (n, 16), 0, 8
            ).astype(jnp.int8),
            done=jax.random.bernoulli(jax.random.fold_in(k, 4), 0.1, (n,)),
        )
        params = net.init(jax.random.PRNGKey(0), enc(tr.state))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        step_bm = learner.make_train_step(net.apply, enc, opt, 0.9)
        out_bm = step_bm(params, params, opt_state, tr)

        cmt = buffer.to_cm(tr)
        apply_cm = cm_forward.build_cm_forward("conv")
        step_cm = learner.make_train_step(
            apply_cm, lambda x: x, opt, 0.9, cm=True
        )
        out_cm = step_cm(params, params, opt_state, cmt)
        np.testing.assert_allclose(
            float(out_bm.loss), float(out_cm.loss), rtol=1e-4
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(out_bm.params),
            jax.tree_util.tree_leaves(out_cm.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
            )


class TestSampleCap:
    def test_cap_masks_to_batch_size(self):
        """env_batch > batch_size: raw draw is one row per env; cap
        attaches a 0/1 weight with EXACTLY batch_size ones."""
        rs = buffer.create(capacity=64, env_batch=32)
        tr = buffer.Transition(
            state=jnp.ones((32, 16), jnp.int8),
            action=jnp.zeros((32,), jnp.int32),
            reward=jnp.ones((32,), jnp.float32),
            next_state=jnp.ones((32, 16), jnp.int8),
            done=jnp.zeros((32,), bool),
        )
        rs = buffer.add_step(rs, tr)
        batch = buffer.sample(rs, jax.random.PRNGKey(0), 12, cap=True)
        assert batch.weight is not None
        w = np.asarray(batch.weight)
        assert w.shape == (1, 32) and int(w.sum()) == 12
        assert set(np.unique(w)) <= {0.0, 1.0}
        # no cap → no weight
        batch2 = buffer.sample(rs, jax.random.PRNGKey(0), 12, cap=False)
        assert batch2.weight is None
        # cap that doesn't bind (raw <= batch_size) → no weight
        batch3 = buffer.sample(rs, jax.random.PRNGKey(0), 32, cap=True)
        assert batch3.weight is None

    def test_weight_scales_loss(self):
        from t48.agent import cm_forward, learner

        net = networks.build_network("dense")
        x = jnp.zeros((8, 16), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        apply_cm = cm_forward.build_cm_forward("dense")
        k = jax.random.PRNGKey(2)
        cmt = buffer.CMTransition(
            state=jax.random.randint(k, (16, 8), 0, 6).astype(jnp.float32),
            action=jax.random.randint(jax.random.fold_in(k, 1), (8,), 0, 4),
            reward=jnp.ones((8,), jnp.float32),
            next_state=jax.random.randint(
                jax.random.fold_in(k, 2), (16, 8), 0, 6
            ).astype(jnp.float32),
            done=jnp.zeros((8,), bool),
        )
        full = learner.td_loss(
            apply_cm, params, params, lambda v: v, cmt, 0.9, cm=True
        )
        half = learner.td_loss(
            apply_cm, params, params, lambda v: v,
            cmt._replace(weight=jnp.array([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)),
            0.9, cm=True,
        )
        assert 0 < float(half) < float(full)
