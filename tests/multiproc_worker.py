"""Worker for the REAL multi-process gather test (run via subprocess).

Each of two processes initializes the actual JAX distributed runtime on
localhost, then exercises the genuine multi-process branches -- no
monkeypatching: ``shard_indices`` striping off the real process index,
``gather_interleaved``'s length-prefixed allgather with UNEQUAL >1 MiB
payloads, and ``dist.sync_metric``'s cross-process reduction.
"""
import sys


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs,
                               process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()

    from detikzify_tpu.evaluate.dist import sync_metric
    from detikzify_tpu.evaluate.harness import (gather_interleaved,
                                                shard_indices)

    n_items = 7
    mine = shard_indices(n_items)       # striped off the REAL process id
    assert mine, f"process {pid} got no items"
    # unequal payloads: process 0's rows are > 1 MiB total
    filler = "x" * (1_200_000 if pid == 0 else 64)
    rows = [(i, {"code": f"{filler}-{i}", "idx": i}) for i in mine]
    merged = gather_interleaved(rows, n_items)
    assert len(merged) == n_items, len(merged)
    for i in range(n_items):
        assert merged[i]["idx"] == i
        assert merged[i]["code"].endswith(f"-{i}")

    class _Metric:
        pass

    m = _Metric()
    m._sum = 10.0 * (pid + 1)           # 10 + 20 across processes
    m._n = 2.0 + pid                    # 2 + 3
    val = sync_metric(m)
    assert abs(val - 30.0 / 5.0) < 1e-9, val

    print(f"OK pid={pid} procs={jax.process_count()} items={len(merged)} "
          f"sync={val}", flush=True)


if __name__ == "__main__":
    main()
