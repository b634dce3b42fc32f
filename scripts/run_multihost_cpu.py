#!/usr/bin/env python
"""Execute the multi-host path FOR REAL: two local processes, a live
jax.distributed coordinator, 4 virtual CPU devices each, MULTIPLE global
train steps through the production driver (`main_train`) with validation +
orbax checkpointing, a SIGKILL of both ranks mid-run, and a `--resume
latest` continuation under a fresh coordinator — then parity against the
same kill/resume choreography run single-process on 8 devices.

VERDICT r4 next #4 (extends the r4 single-step run): tests/test_multihost.py
proves the host-side striding logic under mocks; the r4 script proved one
real step; this proves the trajectory — multi-step training, checkpoint
cadence, kill both ranks, coordinator restart, resume, and continued steps,
replacing the capability at reference train.py:604-636 + the restart loop
(keep_resuming_until_success.sh:1-12).

Usage (parent):  python scripts/run_multihost_cpu.py DATA_ROOT
  where DATA_ROOT is a synthetic tree from scripts/make_synthetic_nyu.py
  (params file at DATA_ROOT/params.txt).

Prints one JSON line: per-rank post-resume param checksums + losses and the
single-process equivalents, with a PASS/FAIL parity verdict.
"""

import glob
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PORT = 12355            # phase A coordinator; phase B uses PORT+1
N_PROC = 2
DEV_PER_PROC = 4
KILL_AT_STEP = 10       # SIGKILL after the step-10 validation+ckpt commits
RESUME_STEPS = 5        # post-resume steps (validation+save fire at 5)

# crop must give >=129 mViT tokens (the conv_out truncation quirk,
# CLAUDE.md) or the 480x640 eval leg can't share the train-initialized
# params. The mViT runs on the DECODER output (input/2), so the token count
# is (H/32)*(W/32): 224x320 -> 7*10 = 70 tokens -> conv_out truncates to 69
# channels (measured failure, /tmp/multihost_r4.log); 320x416 -> 10*13 =
# 130 >= 129 is the smallest standard crop that keeps conv_out at 128.
_OVERRIDES = ["--bs", "8", "--workers", "2", "--validate_every", "5",
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


def _run_one(tag, resume: bool, max_steps):
    """Shared body for worker + single-process legs: run the driver, then a
    checksum over the (replicated) params and the logged train losses."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mde_tpu.config import TrainArgParser, parse_cli
    from mde_tpu.train.driver import main_train

    params_file = sys.argv[2]
    # worker ranks share one root (production shared-fs semantics: orbax
    # process-0 writes + cross-process commit barriers, rank-0-only logging);
    # the single-process control leg gets its own.
    root = "/tmp/mh_workers" if tag.startswith("rank") else "/tmp/mh_single8"
    cli = [params_file] + _OVERRIDES + ["--root", root]
    if resume:
        cli += ["--resume", "latest"]
    args_ns = parse_cli(TrainArgParser(), cli, mode="train")
    args_ns.max_val_batches = 1
    if resume:
        # train.py (the CLI) sets exp_dir before main_train; --resume latest
        # resolves *_latest under it, so mirror that here
        from mde_tpu.utils import setup_exp_dir
        args_ns.exp_dir = setup_exp_dir(root, args_ns.name, interactive=False)
    state = main_train(args_ns, max_steps=max_steps, interactive=False)

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
    # pull the logged train losses back out of the JSONL event file
    losses = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".jsonl"):
                for line in open(os.path.join(dirpath, f)):
                    ev = json.loads(line)
                    if ev.get("tag") == "Train/Loss":
                        losses[ev["step"]] = ev["value"]
    print(json.dumps({"tag": tag, "process_count": jax.process_count(),
                      "n_devices": len(jax.devices()),
                      "checksum": checksum, "stats_sum": stats_sum,
                      "loss0": losses.get(0),
                      "losses": {str(k): v for k, v in sorted(losses.items())}}),
          flush=True)


def worker():
    import faulthandler
    faulthandler.enable()          # rank 1 SEGVs silently without this
    rank = int(sys.argv[3])
    phase = sys.argv[4]            # "a" (fresh, killed by parent) | "b" (resume)
    port = PORT if phase == "a" else PORT + 1
    # Stagger startups: launching both workers into `import jax` +
    # `jax.distributed.initialize` at the same instant on this 1-core box
    # produced a no-output SIGSEGV in rank 1 (2026-08-20, multihost_r4c.log);
    # a few seconds of skew serializes the native-library init.
    time.sleep(8 * rank)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=N_PROC, process_id=rank)
    if phase == "a":
        _run_one(f"rank{rank}a", resume=False, max_steps=None)
    else:
        _run_one(f"rank{rank}", resume=True, max_steps=RESUME_STEPS)
    # Orderly leave: the r4 runs saw shutdown-barrier aborts when ranks
    # raced into interpreter teardown; an explicit shutdown bounds it.
    try:
        jax.distributed.shutdown()
    except Exception as e:          # noqa: BLE001 — best-effort teardown
        print(f"shutdown note: {e}", flush=True)


def single():
    phase = sys.argv[3]
    if phase == "a":
        _run_one("single8a", resume=False, max_steps=None)
    else:
        _run_one("single8", resume=True, max_steps=RESUME_STEPS)


def _events_max_step(root):
    mx, vals = -1, 0
    for ev_file in glob.glob(os.path.join(root, "*", "events.jsonl")):
        for line in open(ev_file):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue            # torn line mid-write
            if ev.get("tag") == "Train/Loss":
                mx = max(mx, ev["step"])
            elif ev.get("tag") == "Metrics/abs_rel":
                vals += 1
    return mx, vals


def _wait_and_kill(procs, root, timeout_s=14400):
    """Poll the run's events.jsonl until the KILL_AT_STEP validation has
    completed (its abs_rel logged => its checkpoint save has been enqueued;
    steps here take tens of seconds, so a short grace covers the async
    commit), then SIGKILL every process. Returns True if the kill fired."""
    t0 = time.time()
    need_vals = KILL_AT_STEP // 5   # validations at 5, 10, ...
    while time.time() - t0 < timeout_s:
        if all(p.poll() is not None for p in procs):
            return False           # finished the epoch before we killed it
        mx, vals = _events_max_step(root)
        if vals >= need_vals and mx >= KILL_AT_STEP:
            time.sleep(15)         # let the step-10 async ckpt commit
            for p in procs:
                if p.poll() is None:
                    p.send_signal(signal.SIGKILL)
            for p in procs:
                p.wait()
            return True
        time.sleep(2)
    return False


def main():
    here = os.path.abspath(__file__)
    data_root = os.path.abspath(sys.argv[1])
    params_file = os.path.join(data_root, "params.txt")
    assert os.path.exists(params_file), params_file

    import shutil
    for stale in ("/tmp/mh_workers", "/tmp/mh_single8"):
        shutil.rmtree(stale, ignore_errors=True)

    env = _base_env()

    def launch_workers(phase):
        logs = [open(f"/tmp/mh_rank{r}{phase}.log", "w") for r in range(N_PROC)]
        procs = [subprocess.Popen(
            [sys.executable, "-u", here, "--worker", params_file, str(r), phase],
            env=env, stdout=logs[r], stderr=subprocess.STDOUT, text=True)
            for r in range(N_PROC)]
        return procs, logs

    # ---- leg A: 2-process fresh run, killed after the step-10 checkpoint
    procs, logs = launch_workers("a")
    killed_2p = _wait_and_kill(procs, "/tmp/mh_workers")
    for lg in logs:
        lg.close()

    # ---- leg B: 2-process resume under a FRESH coordinator
    procs, logs = launch_workers("b")
    codes = [p.wait() for p in procs]
    for lg in logs:
        lg.close()
    outs = [open(f"/tmp/mh_rank{r}b.log").read() for r in range(N_PROC)]
    resumed_2p = any("resumed from" in open(f"/tmp/mh_rank{r}b.log").read()
                     for r in range(N_PROC))

    # ---- legs C/D: the same choreography single-process on 8 devices
    env8 = dict(env)
    env8["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                         " --xla_force_host_platform_device_count=8")
    lgc = open("/tmp/mh_single8a.log", "w")
    pc = subprocess.Popen([sys.executable, "-u", here, "--single",
                           params_file, "a"],
                          env=env8, stdout=lgc, stderr=subprocess.STDOUT,
                          text=True)
    killed_1p = _wait_and_kill([pc], "/tmp/mh_single8")
    lgc.close()
    pd = subprocess.Popen([sys.executable, "-u", here, "--single",
                           params_file, "b"],
                          env=env8, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    out8 = pd.communicate()[0]
    resumed_1p = "resumed from" in out8

    results = {}
    for out in outs + [out8]:
        for line in out.splitlines():
            if line.startswith('{"tag"'):
                r = json.loads(line)
                results[r["tag"]] = r
    ok = (codes == [0, 0] and pd.returncode == 0
          and killed_2p and killed_1p and resumed_2p and resumed_1p
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
                      "killed": {"2p": killed_2p, "1p": killed_1p},
                      "resumed": {"2p": resumed_2p, "1p": resumed_1p},
                      "results": results, "codes": codes + [pd.returncode]}),
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
