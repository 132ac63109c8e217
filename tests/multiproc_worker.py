"""Worker for the REAL multi-process distributed tests (run via subprocess).

Each of two processes initializes the actual JAX distributed runtime on
localhost, then exercises genuine multi-process branches -- no
monkeypatching.  Modes:

``gather`` (default)
    ``shard_indices`` striping off the real process index,
    ``gather_interleaved``'s length-prefixed allgather with UNEQUAL >1 MiB
    payloads, and ``dist.sync_metric``'s cross-process reduction.

``train``
    a genuine multi-HOST training run: a global ('data','model') mesh
    spanning both processes (2 local CPU devices each -> 2x2), FSDP+TP
    parameter shardings from ``parallel.mesh``, per-process local batch
    shards assembled into global arrays, and three jitted train steps
    whose gradient reduction crosses the process boundary.  Prints the
    loss trajectory and a post-update parameter checksum so the test can
    assert both processes stayed bit-identical.
"""
import sys


def run_train(pid: int) -> None:
    import jax
    import numpy as np
    import optax

    from detikzify_tpu.config import tiny_test_config
    from detikzify_tpu.models import detikzify
    from detikzify_tpu.parallel.mesh import (data_sharding, make_mesh,
                                             shard_params)
    from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor
    from detikzify_tpu.train import data as tdata
    from detikzify_tpu.train.step import (init_state, make_optimizer,
                                          make_train_step, trainable_mask)

    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2
    mesh = make_mesh(data=2, model=2)
    # the mesh must actually straddle the process boundary
    procs = {d.process_index for d in mesh.devices.flat}
    assert procs == {0, 1}, procs

    cfg = tiny_test_config(vocab_size=512).replace(model_max_length=96)
    params = detikzify.init(jax.random.PRNGKey(0), cfg)   # deterministic
    tok = ByteTokenizer(vocab_size=512, image_token_id=cfg.image_token_id,
                        bos_token_id=cfg.bos_token_id,
                        eos_token_id=cfg.eos_token_id, model_max_length=96)
    processor = DetikzifyProcessor(tok, cfg)

    def put_global(host_tree, shardings):
        """Assemble global arrays: every process holds the full host value
        and contributes only its addressable shards."""
        return jax.tree.map(
            lambda x, s: jax.make_array_from_callback(
                np.shape(x), s, lambda idx: np.asarray(x)[idx]),
            host_tree, shardings)

    params = put_global(params, shard_params(params, mesh, fsdp=True))

    from PIL import Image, ImageDraw

    def figure(seed):
        img = Image.new("RGB", (80, 60), "white")
        ImageDraw.Draw(img).rectangle([4 + seed, 4, 70, 50],
                                      outline="black", width=2)
        return img

    # global batch of 4 rows -> 2 per data-mesh row; identical on both
    # processes (put_global slices each process's shard out of it)
    texts = [f"\\draw (0,{i}) -- (1,{i});" for i in range(4)]
    batch = tdata.tokenize_batch(processor, texts,
                                 images=[figure(i) for i in range(4)])
    batch = put_global(
        batch, {k: data_sharding(mesh, np.asarray(v).ndim)
                for k, v in batch.items()})

    opt = make_optimizer(1e-2, total_steps=3,
                         trainable=trainable_mask(params, "all"))
    state = init_state(params, opt)
    step = jax.jit(make_train_step(cfg, opt, attn_impl="xla"))

    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))    # fully-replicated scalar
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses        # it actually learns
    checksum = float(jax.jit(optax.global_norm)(state.params))
    print(f"OK pid={pid} procs={jax.process_count()} "
          f"loss0={losses[0]:.6f} loss2={losses[-1]:.6f} "
          f"checksum={checksum:.6f}", flush=True)


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "gather"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs,
                               process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()

    if mode == "train":
        run_train(pid)
        return

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
