"""Multi-chip sharding on a virtual 8-device CPU mesh (SURVEY.md §4d).

Asserts (a) the DP layout places env/replay on 'data' and replicates
params, (b) the unchanged jitted train chunk runs SPMD over the mesh,
and (c) sharded training is numerically equivalent to single-device
training (the psum-gradient-equivalence check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from t48.configs import get_preset
from t48.distrib import distribute_train_state, make_mesh, train_state_shardings
from t48.train import loop as loop_lib


def tiny_config(**kw):
    base = dict(
        env_batch=16,  # divisible by 8 devices
        batch_size=32,
        replay_buffer_length=512,
        no_episodes=100,
        no_episodes_before_training=2,
        no_episodes_before_updating_target=5,
        chunk_iters=16,
        episode_log_size=128,
        seed=0,
    )
    base.update(kw)
    return get_preset("dense", **base)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh()


class TestMesh:
    def test_mesh_axes(self, mesh):
        assert mesh.axis_names == ("data", "model")
        assert mesh.shape["data"] == 8
        assert mesh.shape["model"] == 1

    def test_sharding_assignment(self, mesh):
        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        sh = train_state_shardings(state, mesh, cfg)
        assert sh.env.boards.spec == P("data")
        # replay rows are cell-major [components, ring, B]: 'data' minor
        assert sh.replay.rows.spec == P(None, None, "data")
        assert sh.ep_reward_sum.spec == P("data")
        # params replicated
        for leaf in jax.tree_util.tree_leaves(sh.params):
            assert leaf.spec == P()
        # scalars replicated
        assert sh.episodes_done.spec == P()

    def test_distributed_state_is_sharded(self, mesh):
        cfg = tiny_config()
        state = distribute_train_state(
            loop_lib.create_train_state(cfg), mesh, cfg
        )
        boards_sharding = state.env.boards.sharding
        assert boards_sharding.spec == P("data")
        assert len(boards_sharding.device_set) == 8

    def test_process_local_init_matches_distribute(self, mesh):
        """create_train_state(mesh=…) builds shards in place via jitted
        out_shardings (the multi-host-safe construction) and must produce
        exactly the state that host-side create + distribute produces."""
        cfg = tiny_config()
        direct = loop_lib.create_train_state(cfg, mesh=mesh)
        placed = distribute_train_state(
            loop_lib.create_train_state(cfg), mesh, cfg
        )
        assert direct.env.boards.sharding.spec == P("data")
        assert direct.replay.rows.sharding.spec == P(None, None, "data")
        for a, b in zip(
            jax.tree_util.tree_leaves(direct), jax.tree_util.tree_leaves(placed)
        ):
            assert np.array_equal(
                np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
            )


class TestShardedTraining:
    def test_chunk_runs_spmd(self, mesh):
        cfg = tiny_config()
        state = distribute_train_state(
            loop_lib.create_train_state(cfg), mesh, cfg
        )
        chunk = loop_lib.make_train_chunk(cfg)
        state, snap = chunk(state)
        jax.block_until_ready(state.params)
        assert int(state.env_steps) == cfg.chunk_iters * cfg.env_batch
        assert int(state.episodes_done) >= 0

    def test_sharded_equals_single_device(self, mesh):
        """DP training == single-device training: identical env dynamics
        (integer state) and near-identical params (float psum order).

        f32 compute so the tight tolerance stays meaningful — under bf16
        the psum-order noise is amplified past any tolerance that would
        still catch a real sharding bug; the bf16 path's sharded
        correctness is covered by the integer-state equality here plus
        the HLO collective assertions below."""
        cfg = tiny_config(compute_dtype="float32")
        chunk = loop_lib.make_train_chunk(cfg)

        s_single = loop_lib.create_train_state(cfg)
        s_shard = distribute_train_state(
            loop_lib.create_train_state(cfg), mesh, cfg
        )
        for _ in range(4):
            s_single, _ = chunk(s_single)
            s_shard, _ = chunk(s_shard)
        # integer state: exact
        assert int(s_single.episodes_done) == int(s_shard.episodes_done)
        assert int(s_single.train_steps) == int(s_shard.train_steps)
        assert np.array_equal(
            np.asarray(s_single.env.boards), np.asarray(jax.device_get(s_shard.env.boards))
        )
        assert np.array_equal(
            np.asarray(s_single.replay.state),
            np.asarray(jax.device_get(s_shard.replay.state)),
        )
        # float params: allclose (reduction-order tolerance)
        for a, b in zip(
            jax.tree_util.tree_leaves(s_single.params),
            jax.tree_util.tree_leaves(s_shard.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(jax.device_get(b)), rtol=1e-4, atol=1e-5
            )

    def test_no_transition_collectives_in_hlo(self, mesh):
        """Per-env replay rings + stratified sampling keep transitions
        shard-local: the compiled SPMD train chunk must contain NO
        all-to-all and no all-gather bigger than a per-env metrics row —
        the parameter-gradient all-reduce (psum) is the only large
        collective (SURVEY.md §7 'Replay at scale', mesh.py design note).
        """
        import re

        cfg = tiny_config(chunk_iters=4)
        state = distribute_train_state(
            loop_lib.create_train_state(cfg), mesh, cfg
        )
        chunk = loop_lib.make_train_chunk(cfg)
        txt = chunk.lower(state).compile().as_text()

        assert "all-to-all" not in txt

        dtype_bytes = {"s8": 1, "u8": 1, "pred": 1, "bf16": 2, "f16": 2,
                       "s16": 2, "u16": 2, "f32": 4, "s32": 4, "u32": 4,
                       "f64": 8, "s64": 8, "u64": 8}

        def op_bytes(line):
            m = re.search(r"= (\w+)\[([\d,]*)\][^ ]* ", line)
            if not m:
                return 0
            dt, dims = m.groups()
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            return n * dtype_bytes.get(dt, 4)

        # every all-gather is a per-env metric/log row: ≤ env_batch
        # packed 7-column int32 episode-ring rows (loop._LOG_COLS) —
        # never a sampled-transition batch (≥ batch_size*16 bytes)
        ag_limit = cfg.env_batch * 4 * 7
        for line in txt.splitlines():
            if "all-gather(" in line and "=" in line:
                assert op_bytes(line) <= ag_limit, line.strip()[:200]

        # the gradient psum over the params IS present (512x512 kernel)
        ar_sizes = [
            op_bytes(line)
            for line in txt.splitlines()
            if re.search(r"= \(?\w+\[[\d,]*\][^ ]* all-reduce\(", line)
            or ("all-reduce(" in line and "= (" in line)
        ]
        assert any(s >= 512 * 512 * 4 for s in ar_sizes) or any(
            "512,512" in line
            for line in txt.splitlines()
            if "all-reduce" in line
        )

    def test_scales_to_larger_batch(self, mesh):
        cfg = tiny_config(env_batch=64)
        state = distribute_train_state(
            loop_lib.create_train_state(cfg), mesh, cfg
        )
        chunk = loop_lib.make_train_chunk(cfg)
        state, _ = chunk(state)
        assert int(state.env_steps) == cfg.chunk_iters * 64

    def test_resume_under_mesh(self, mesh, tmp_path):
        """--resume --data-parallel: restore on the host, re-place on the
        mesh (make_array_from_callback), continue training."""
        from t48.train.trainer import train

        cfg = tiny_config(no_episodes=12)
        s1, exp1 = train(
            cfg, root_dir=str(tmp_path), job_name="dpresume",
            verbose=False, data_parallel=8,
        )
        done1 = int(s1.episodes_done)
        assert done1 >= 12
        s2, _ = train(
            cfg.replace(no_episodes=done1 + 12),
            root_dir=str(tmp_path), job_name="dpresume",
            resume=True, verbose=False, data_parallel=8,
        )
        assert int(s2.episodes_done) >= done1 + 12
        assert s2.env.boards.sharding.spec == P("data")
        # counters continued, not restarted
        assert int(s2.env_steps) > int(s1.env_steps)
