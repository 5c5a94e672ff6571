"""Worker process for the multi-host (DCN) integration test.

Usage: python dcn_worker.py <process_id> <coordinator_port>

Each of the 2 processes exposes 4 virtual CPU devices; jax.distributed
joins them into one 8-device runtime (the DCN analog: collectives between
processes cross the coordinator-established transport). The worker runs the
sharded top-m scorer over a global mesh spanning both hosts and checks the
merged result against the single-device reference computed locally.
"""

import os
import sys


def main() -> int:
    pid, port = int(sys.argv[1]), sys.argv[2]
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from omni_recall_tpu.parallel.distributed import initialize_multihost

    initialize_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omni_recall_tpu.ops import xla_scorer
    from omni_recall_tpu.parallel.mesh import shards_mesh
    from omni_recall_tpu.parallel.sharded import ShardedScorer

    n, d, bits, b, m = 1024, 16, 64, 2, 8
    rng = np.random.default_rng(0)  # same seed on both hosts -> same globals
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    bloom = rng.integers(0, 256, size=(n, bits // 8), dtype=np.uint8)
    created = np.linspace(0.0, 30.0, n).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    kw_w = np.zeros((b, bits), dtype=np.float32)
    kw_b = np.zeros(b, dtype=np.float32)

    mesh = shards_mesh(devices=jax.devices())
    row = NamedSharding(mesh, P("shards", None))
    vec = NamedSharding(mesh, P("shards"))

    def dist(a, sharding):
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx: a[idx]
        )

    ss = ShardedScorer(mesh)
    got_v, got_i = ss.score_topm(
        dist(emb, row), dist(bloom, row), dist(created, vec), dist(valid, vec),
        jnp.asarray(q), jnp.asarray(kw_w), jnp.asarray(kw_b),
        jnp.float32(30.0), jnp.int32(100), m=m, mode="xla",
    )
    got_v = np.asarray(got_v)
    got_i = np.asarray(got_i)

    want_v, want_i = xla_scorer.score_topm(
        jnp.asarray(emb), jnp.asarray(bloom), jnp.asarray(created),
        jnp.asarray(valid), jnp.asarray(q), jnp.asarray(kw_w),
        jnp.asarray(kw_b), jnp.float32(30.0), jnp.int32(100), m=m,
    )
    want_v, want_i = np.asarray(want_v), np.asarray(want_i)

    assert np.array_equal(got_v[:, :m], want_v[:, :m]), "candidate values differ"
    for qi in range(b):
        assert set(got_i[qi, :m].tolist()) == set(want_i[qi, :m].tolist())
    assert np.array_equal(got_v[:, m], want_v[:, m]), "boundaries differ"
    print(f"DCN-OK pid={pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
