#!/usr/bin/env python
"""Execute the multi-host path FOR REAL: two local processes, a live
jax.distributed coordinator, 4 virtual CPU devices each, one global train
step through the production driver (`main_train`), then loss/param parity
against the same config run single-process on 8 devices.

VERDICT r3 next #4: tests/test_multihost.py proves the host-side striding
logic under mocks; this script proves the actual system — a real
`jax.distributed.initialize`, real `make_array_from_process_local_data`
assembly of the global batch, the GSPMD step over a mesh spanning both
processes, and a checkpoint save per rank. Replaces the capability at
reference train.py:604-636 (SLURM multi-node rendezvous + DDP).

Usage (parent):  python scripts/run_multihost_cpu.py DATA_ROOT
  where DATA_ROOT is a synthetic tree from scripts/make_synthetic_nyu.py
  (params file at DATA_ROOT/params.txt).

Prints one JSON line: per-rank post-step param checksums + logged losses and
the single-process equivalents, with a PASS/FAIL parity verdict.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PORT = 12355
N_PROC = 2
DEV_PER_PROC = 4

# crop must give >=129 mViT tokens (the conv_out truncation quirk,
# CLAUDE.md) or the 480x640 eval leg can't share the train-initialized
# params. The mViT runs on the DECODER output (input/2), so the token count
# is (H/32)*(W/32): 224x320 -> 7*10 = 70 tokens -> conv_out truncates to 69
# channels (measured failure, /tmp/multihost_r4.log); 320x416 -> 10*13 =
# 130 >= 129 is the smallest standard crop that keeps conv_out at 128.
_OVERRIDES = ["--bs", "8", "--workers", "2", "--validate_every", "1000",
              "--input_height", "320", "--input_width", "416",
              "--epochs", "1"]


def _base_env():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={DEV_PER_PROC}")
    env["JAX_PLATFORMS"] = "cpu"
    # NO persistent compile cache here, deliberately: XLA:CPU AOT cache
    # entries failed to reload on this very box ("machine type ... doesn't
    # match", cpu_aot_loader) and the per-rank hit/miss asymmetry blew
    # Gloo's 30 s context-pairing window deterministically. Cache-less, the
    # two ranks' identical from-scratch compiles stay in near-lockstep
    # under 1-core contention and the pairing succeeds (measured: run i).
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    # Replace PYTHONPATH so the axon sitecustomize (TPU plugin) never loads:
    # its PJRT plugin segfaults under jax.distributed on the CPU backend, and
    # with it gone the JAX_PLATFORMS/XLA_FLAGS env vars apply normally.
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return env


def _run_one(args, tag):
    """Shared body for worker + single-process legs: one driver step, then a
    checksum over the (replicated) params and the step-0 train loss."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mde_tpu.config import TrainArgParser, parse_cli
    from mde_tpu.train.driver import main_train

    params_file = sys.argv[2]
    # worker ranks share one root (production shared-fs semantics: orbax
    # process-0 writes + cross-process commit barriers, rank-0-only logging);
    # the single-process control leg gets its own.
    root = "/tmp/mh_workers" if tag.startswith("rank") else f"/tmp/mh_{tag}"
    cli = [params_file] + _OVERRIDES + ["--root", root]
    args_ns = parse_cli(TrainArgParser(), cli, mode="train")
    args_ns.max_val_batches = 1
    state = main_train(args_ns, max_steps=1, interactive=False)

    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(float(np.abs(np.asarray(l.addressable_data(0))).sum())
                         for l in leaves))
    # batch_stats is the SHARP parity signal: every BN site is upstream of
    # the mViT's dropout, and batch moments are multiset-invariant in the
    # batch rows — so the 2-process run (whose global batch is a row
    # PERMUTATION of the single-process one) must reproduce it to fp noise.
    # The train LOSS, by contrast, legitimately moves ~1% between
    # topologies: dropout masks are drawn once for the whole batched
    # tensor, so row order changes mask<->image pairing (measured: a pure
    # row permutation moved SILog 4.823 -> 5.078 at init; the reference's
    # DDP has the same property across ranks).
    stats_sum = float(sum(float(np.abs(np.asarray(l.addressable_data(0))).sum())
                          for l in jax.tree_util.tree_leaves(state.batch_stats)))
    # pull the logged step-0 train loss back out of the JSONL event file
    loss = None
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".jsonl"):
                for line in open(os.path.join(dirpath, f)):
                    ev = json.loads(line)
                    if ev.get("tag") == "Train/Loss" and ev.get("step") == 0:
                        loss = ev["value"]
    print(json.dumps({"tag": tag, "process_count": jax.process_count(),
                      "n_devices": len(jax.devices()),
                      "checksum": checksum, "stats_sum": stats_sum,
                      "loss0": loss}), flush=True)


def worker():
    import faulthandler
    faulthandler.enable()          # rank 1 SEGVs silently without this
    rank = int(sys.argv[3])
    # Stagger startups: launching both workers into `import jax` +
    # `jax.distributed.initialize` at the same instant on this 1-core box
    # produced a no-output SIGSEGV in rank 1 (2026-08-20, multihost_r4c.log);
    # a few seconds of skew serializes the native-library init.
    import time
    time.sleep(8 * rank)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=N_PROC, process_id=rank)
    _run_one(None, f"rank{rank}")


def single():
    _run_one(None, "single8")


def main():
    here = os.path.abspath(__file__)
    data_root = os.path.abspath(sys.argv[1])
    params_file = os.path.join(data_root, "params.txt")
    assert os.path.exists(params_file), params_file

    import shutil
    for stale in ("/tmp/mh_workers", "/tmp/mh_single8"):
        shutil.rmtree(stale, ignore_errors=True)

    env = _base_env()
    logs = [open(f"/tmp/mh_rank{r}.log", "w") for r in range(N_PROC)]
    procs = [subprocess.Popen(
        [sys.executable, "-u", here, "--worker", params_file, str(r)],
        env=env, stdout=logs[r], stderr=subprocess.STDOUT, text=True)
        for r in range(N_PROC)]
    codes = [p.wait() for p in procs]
    for lg in logs:
        lg.close()
    outs = [open(f"/tmp/mh_rank{r}.log").read() for r in range(N_PROC)]

    env8 = dict(env)
    env8["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                         " --xla_force_host_platform_device_count=8")
    p8 = subprocess.Popen([sys.executable, "-u", here, "--single", params_file],
                          env=env8, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    out8 = p8.communicate()[0]

    results = {}
    for out in outs + [out8]:
        for line in out.splitlines():
            if line.startswith('{"tag"'):
                r = json.loads(line)
                results[r["tag"]] = r
    ok = (codes == [0, 0] and p8.returncode == 0
          and {"rank0", "rank1", "single8"} <= set(results))
    if ok:
        c0, c1, c8 = (results[t]["checksum"]
                      for t in ("rank0", "rank1", "single8"))
        s0, s1, s8 = (results[t]["stats_sum"]
                      for t in ("rank0", "rank1", "single8"))
        l0, l8 = results["rank0"]["loss0"], results["single8"]["loss0"]
        ok = (abs(c0 - c1) / max(abs(c8), 1e-9) < 1e-6      # replicas agree
              and abs(c0 - c8) / max(abs(c8), 1e-9) < 1e-4  # vs single-proc
              and abs(s0 - s1) / max(abs(s8), 1e-9) < 1e-6  # stats replicas
              and abs(s0 - s8) / max(abs(s8), 1e-9) < 1e-4  # dropout-free gate
              and l0 is not None and l8 is not None
              # dropout mask<->row pairing differs between topologies (see
              # _run_one comment); 2% bounds that artifact while still
              # catching wrong-data/wrong-collective failures
              and abs(l0 - l8) / max(abs(l8), 1e-9) < 2e-2)
    print(json.dumps({"multihost_parity": "PASS" if ok else "FAIL",
                      "results": results, "codes": codes + [p8.returncode]}),
          flush=True)
    if not ok:
        for i, out in enumerate(outs + [out8]):
            sys.stderr.write(f"--- proc {i} tail ---\n" + out[-2000:] + "\n")
        sys.exit(1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker()
    elif len(sys.argv) > 1 and sys.argv[1] == "--single":
        single()
    else:
        main()
