"""Two-process DCN dryrun (VERDICT r2 item 5 / SURVEY §5.8).

Runs the framework's distributed code path across TWO OS processes joined by
``jax.distributed`` (gloo collectives — the CPU stand-in for DCN): a global
2x4 mesh whose ``data`` axis spans the process boundary, exercising

  1. cross-process data-parallel Hessian accumulation (psum over DCN),
  2. a GPTQ solve on the merged Hessian (identical on both processes),
  3. tensor-parallel quantized forward (TP within process, DP across),
  4. sharded serving decode steps via ``scaling_report``.

Writes MULTIHOST_DRYRUN.json at the repo root from process 0. This is the
offline proof that the multi-host story is executable code, not structure —
the same ``jax.distributed`` + mesh path runs unchanged on real multi-host
TPU slices (BASELINE >= 85% 2-host scaling target needs real hardware).

Usage: python scripts/multihost_dryrun.py            # spawns both processes
       python scripts/multihost_dryrun.py --proc N   # internal child mode
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
COORD = "127.0.0.1:12957"
NPROC = 2
LOCAL_DEVICES = 4  # per process -> 8 global


def child(proc_id: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=NPROC, process_id=proc_id
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, str(REPO))
    from gptqmodel_tpu.models.transformer import (
        decoder_layer, embed, make_causal_mask, rope_cos_sin,
    )
    from gptqmodel_tpu.parallel.sharding import make_mesh, shard_params
    from gptqmodel_tpu.quantization.gptq import gptq_quantize
    from gptqmodel_tpu.utils.testing import (
        quantize_params_rtn, random_dense_params, tiny_spec,
    )

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == NPROC * LOCAL_DEVICES, (n_global, n_local)
    report: dict = {
        "processes": NPROC,
        "local_devices": n_local,
        "global_devices": n_global,
        "stages": {},
    }

    dp, tp = NPROC, LOCAL_DEVICES  # data axis SPANS the process boundary
    mesh = make_mesh({"data": dp, "model": tp})
    spec = tiny_spec(
        hidden=128, layers=2, heads=tp * 2, kv_heads=tp, inter=128 * tp,
        vocab=128 * tp,
    )
    dense = random_dense_params(spec)  # same seed in both processes

    B, T = dp * 2, 16
    ids = np.arange(B * T).reshape(B, T) % spec.vocab_size
    row_mask = np.ones((B, T), np.float32)

    # ---- stage 1: DP Hessian accumulation, psum across the process gap ----
    dense_sh = shard_params(dense, mesh)
    ids_sh = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)),
        ids[proc_id * (B // dp): (proc_id + 1) * (B // dp)].astype(np.int32),
        global_shape=ids.shape,
    )
    mask_sh = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)),
        row_mask[proc_id * (B // dp): (proc_id + 1) * (B // dp)],
        global_shape=row_mask.shape,
    )
    cos, sin = rope_cos_sin(spec, jnp.broadcast_to(jnp.arange(T), (B, T)))
    bias = make_causal_mask(T, T)
    in_f = spec.hidden_size
    h_sharding = NamedSharding(mesh, P())

    @jax.jit
    def hessian_step(params, ids, mask, G, n):
        h = embed(spec, params, ids, jnp.float32)
        taps = {}
        decoder_layer(
            spec, params["model"]["layers"][0], h, cos, sin, bias,
            taps=taps, tap_paths=frozenset({"self_attn.q_proj"}),
        )
        x = taps["self_attn.q_proj"].reshape(-1, in_f) * mask.reshape(-1)[:, None]
        G = G + jnp.matmul(x.T, x, precision="highest")
        return jax.lax.with_sharding_constraint(G, h_sharding), n + mask.sum()

    G0 = jax.device_put(jnp.zeros((in_f, in_f), jnp.float32), h_sharding)
    t0 = time.perf_counter()
    G, n = hessian_step(dense_sh, ids_sh, mask_sh, G0, jnp.float32(0.0))
    G.block_until_ready()
    tr = float(jax.device_get(jnp.trace(G)))
    report["stages"]["dp_hessian_psum"] = {
        "n": float(jax.device_get(n)),
        "trace_G": tr,
        "wall_s": round(time.perf_counter() - t0, 3),
    }

    # ---- stage 2: GPTQ solve on the merged Hessian ------------------------
    W = np.asarray(dense["model"]["layers"][0]["self_attn"]["q_proj"]["weight"])
    Gh = np.asarray(jax.device_get(G))
    res = gptq_quantize(
        W, (2.0 / float(jax.device_get(n))) * Gh, bits=4, group_size=64,
        sym=True, nsamples=int(jax.device_get(n)),
    )
    report["stages"]["gptq_solve"] = {"avg_loss": float(res.avg_loss)}

    # ---- stage 3: TP quantized forward (DP batch across processes) --------
    qparams = quantize_params_rtn(
        random_dense_params(spec), bits=4, group_size=64
    )
    qparams_sh = shard_params(qparams, mesh)

    @jax.jit
    def tp_forward(params, ids):
        h = embed(spec, params, ids, jnp.float32)
        for lp in params["model"]["layers"]:
            h, _ = decoder_layer(spec, lp, h, cos, sin, bias)
        return h

    t0 = time.perf_counter()
    out = tp_forward(qparams_sh, ids_sh)
    out.block_until_ready()
    onorm = float(jnp.linalg.norm(out))
    report["stages"]["tp_forward"] = {
        "out_shape": list(out.shape),
        "norm": onorm,
        "wall_s": round(time.perf_counter() - t0, 3),
    }

    # ---- stage 4: sharded serving decode via scaling_report ---------------
    from gptqmodel_tpu.parallel.serving import scaling_report

    rows = scaling_report(
        spec, qparams, [{"data": dp, "model": tp}], batch=B, T=T,
        max_len=T + 8, steps=4,
    )
    report["stages"]["sharded_serving"] = rows

    if proc_id == 0:
        report["result"] = "PASS"
        out_path = REPO / "MULTIHOST_DRYRUN.json"
        out_path.write_text(json.dumps(report, indent=1) + "\n")
        print(json.dumps(report, indent=1))
    print(f"proc {proc_id}: DONE", flush=True)


def main() -> None:
    if "--proc" in sys.argv:
        child(int(sys.argv[sys.argv.index("--proc") + 1]))
        return
    procs = []
    for i in range(NPROC):
        env = dict(os.environ)
        procs.append(
            subprocess.Popen(
                [sys.executable, __file__, "--proc", str(i)],
                env=env, cwd=str(REPO),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        txt = out.decode(errors="replace")
        if p.returncode != 0 or f"proc {i}: DONE" not in txt:
            ok = False
            print(f"--- proc {i} FAILED (rc={p.returncode}) ---")
            print(txt[-4000:])
    if ok:
        print("multihost dryrun: PASS (see MULTIHOST_DRYRUN.json)")
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
