"""Real-TPU tests (opt-in): the compiled Pallas kernel paths that have no
CPU lowering (TPU PRNG), including the mesh+shard_map training branch.

Run with ``T48_TPU_TESTS=1 python -m pytest tests/test_tpu_device.py``
against the tunneled TPU (conftest.py leaves the backend alone in that
mode). Under the default CPU suite every test here skips.

These close VERDICT r04 missing #2: the ``jax.shard_map(pallas_env_step)``
branch (t48/train/loop.py) — the exact code path a real v5e-8 job
compiles — was previously exercised by no test or committed run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("T48_TPU_TESTS")
    or jax.default_backend() != "tpu",
    reason="needs T48_TPU_TESTS=1 and a TPU backend",
)

if os.environ.get("T48_TPU_TESTS"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _warm_boards(batch, steps=60, seed=42):
    from t48.env import engine

    key = jax.random.PRNGKey(seed)

    @jax.jit
    def warmup(key):
        env = engine.init(key, batch)

        def body(env, i):
            k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
            acts = jax.random.randint(k1, (batch,), 0, 4)
            env, _, done = engine.step(env, acts, k2)
            env = engine.reset_where(env, done, k3)
            return env, None

        env, _ = jax.lax.scan(body, env, jnp.arange(steps))
        return env

    return warmup(key).boards


@requires_tpu
class TestPaddedKernel:
    """``pallas_env_step`` accepts any batch size (internal block padding,
    r05; the r04 wrapper asserted B % 1024 == 0)."""

    @pytest.mark.parametrize("batch", [640, 2560, 5000])
    def test_odd_batch_contract(self, batch):
        """Exact single-step contract at non-block batches: rewards and
        merged (non-spawn) cells match the XLA engine; terminal envs
        reset to fresh two-tile boards; output legality is the true
        legality of the output boards."""
        from t48.env import engine
        from t48.ops import pallas_step as ps

        boards = _warm_boards(batch)
        cm = jax.jit(ps.to_cell_major)(boards)
        legal_cm = jax.jit(ps.legal_to_cell_major)(boards)
        actions = jax.random.randint(jax.random.PRNGKey(7), (batch,), 0, 4)
        new_cm, pre_cm, new_legal_cm, reward = ps.pallas_env_step(
            cm, legal_cm, actions, jnp.asarray([123, 456], jnp.int32)
        )
        assert new_cm.shape == (16, batch)
        assert reward.shape == (batch,)

        @jax.jit
        def xla_ref(boards, actions):
            cells = engine.split_cells(boards)
            legal_list = engine.legal_cells(cells, 4)
            sel_cells, delta = engine.apply_chosen_cells(cells, actions, 4)
            did = engine._select_lane(legal_list, actions)
            return (
                jnp.stack(legal_list, -1),
                engine.assemble_cells(sel_cells, 4),
                jnp.where(did, delta, 0),
                did,
            )

        legal, merged, exp_reward, did = xla_ref(boards, actions)
        assert np.array_equal(np.asarray(reward), np.asarray(exp_reward))
        pre = np.asarray(jax.device_get(pre_cm)).T.reshape(batch, 16)
        merged_np = np.asarray(merged).reshape(batch, 16)
        did_np = np.asarray(did)
        orig = np.asarray(boards).reshape(batch, 16)
        done_np = ~np.asarray(legal).any(-1)
        new = np.asarray(jax.device_get(new_cm)).T.reshape(batch, 16)
        for i in range(batch):
            if did_np[i]:
                diff = pre[i] - merged_np[i]
                nz = np.nonzero(diff)[0]
                assert len(nz) == 1 and merged_np[i][nz[0]] == 0
                assert pre[i][nz[0]] in (1, 2)
            else:
                assert np.array_equal(pre[i], orig[i])
            if done_np[i]:
                vals = new[i][new[i] > 0]
                assert len(vals) == 2 and set(vals.tolist()) <= {1, 2}
            else:
                assert np.array_equal(new[i], pre[i])
        expect_legal = np.asarray(
            jax.jit(ps.legal_to_cell_major)(
                jnp.asarray(new).reshape(batch, 4, 4)
            )
        )
        assert np.array_equal(np.asarray(new_legal_cm), expect_legal)

    def test_padding_is_prefix_exact(self):
        """A B=640 call must produce bit-identical results to a manually
        zero-padded B=1024 call's first 640 lanes: the wrapper's padding
        preserves the block→tile mapping and the PRNG stream."""
        from t48.ops import pallas_step as ps

        batch = 640
        boards = _warm_boards(batch)
        cm = jax.jit(ps.to_cell_major)(boards)
        legal_cm = jax.jit(ps.legal_to_cell_major)(boards)
        actions = jax.random.randint(jax.random.PRNGKey(3), (batch,), 0, 4)
        seed = jnp.asarray([11, 22], jnp.int32)

        out_odd = ps.pallas_env_step(cm, legal_cm, actions, seed)
        pad = 1024 - batch
        out_pad = ps.pallas_env_step(
            jnp.pad(cm, ((0, 0), (0, pad))),
            jnp.pad(legal_cm, ((0, 0), (0, pad))),
            jnp.pad(actions, ((0, pad),)),
            seed,
        )
        for a, b in zip(out_odd, out_pad):
            sl = b[..., :batch]
            assert np.array_equal(np.asarray(a), np.asarray(sl))

    def test_two_word_seed_decorrelates(self):
        """Same (w0, w1) → identical outputs; changing ONLY the second
        word changes the spawn stream (the r04 kernel ignored it)."""
        from t48.ops import pallas_step as ps

        batch = 1024
        boards = _warm_boards(batch)
        cm = jax.jit(ps.to_cell_major)(boards)
        legal_cm = jax.jit(ps.legal_to_cell_major)(boards)
        actions = jnp.zeros((batch,), jnp.int32)
        a = ps.pallas_env_step(cm, legal_cm, actions,
                               jnp.asarray([5, 100], jnp.int32))
        b = ps.pallas_env_step(cm, legal_cm, actions,
                               jnp.asarray([5, 100], jnp.int32))
        c = ps.pallas_env_step(cm, legal_cm, actions,
                               jnp.asarray([5, 101], jnp.int32))
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


@requires_tpu
class TestMeshPallasBranch:
    """The flagship multi-chip program: ``jax.shard_map(pallas_env_step)``
    over the 'data' mesh inside the jitted train chunk."""

    def _cfg(self, **kw):
        from t48.configs import get_preset

        base = dict(
            env_batch=2560,
            batch_size=256,
            replay_buffer_length=15000,
            chunk_iters=64,
            no_episodes_before_training=0,
            no_episodes_before_updating_target=50,
            max_updates_per_iteration=4,
            # f32 so the meshless/meshed integer trajectories compare
            # exactly (bf16 psum-order noise can flip a greedy argmax)
            compute_dtype="float32",
            seed=9,
        )
        base.update(kw)
        return get_preset("conv", **base)

    def test_exact_batch_config_resolves_pallas(self):
        from t48.distrib import make_mesh
        from t48.train import loop as loop_lib

        cfg = self._cfg()
        mesh = make_mesh(n_data=1)
        assert loop_lib.resolve_env_backend(cfg) == "pallas"
        assert loop_lib.resolve_env_backend(cfg, mesh) == "pallas"

    def test_dp1_mesh_matches_unmeshed_exactly(self):
        """A 1-device 'data' mesh compiles the full shard_map(pallas)
        branch (including the axis-index seed mix, which is the identity
        on shard 0); its integer state trajectory must equal the
        unmeshed program's bit-for-bit across two chunks."""
        from t48.distrib import make_mesh
        from t48.train import loop as loop_lib

        cfg = self._cfg()
        mesh = make_mesh(n_data=1)
        assert loop_lib.resolve_env_backend(cfg, mesh) == "pallas"

        s0 = loop_lib.create_train_state(cfg)
        chunk0 = loop_lib.make_train_chunk(cfg)
        sm = loop_lib.create_train_state(cfg, mesh=mesh)
        chunkm = loop_lib.make_train_chunk(cfg, mesh=mesh)
        for _ in range(2):
            s0, _ = chunk0(s0)
            sm, _ = chunkm(sm)
        jax.block_until_ready((s0.params, sm.params))

        def digest(s):
            return {
                "episodes": int(s.episodes_done),
                "steps": int(s.env_steps),
                "updates": int(s.train_steps),
                "boards": int(np.asarray(jax.device_get(s.env.boards))
                              .astype(np.int64).sum()),
                "merge": int(np.asarray(jax.device_get(s.env.merge_scores))
                             .astype(np.int64).sum()),
                "fill": int(s.replay.fill),
            }

        assert digest(s0) == digest(sm)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(s0.env.boards)),
            np.asarray(jax.device_get(sm.env.boards)),
        )
