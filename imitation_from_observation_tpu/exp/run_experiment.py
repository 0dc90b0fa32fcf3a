"""Experiment runner CLI.

Replaces the reference's ``run_experiment_lite`` + entry script
(rllab/misc/instrument.py:338-520, scripts/run_experiment_lite.py): an
experiment is a *typed json spec* — launcher name + ExperimentConfig + kwargs
— not a base64 pickle of live objects. Modes: ``inline`` (this process) and
``local`` (subprocess per variant, sequential). The spec and the full config
are saved into the experiment dir (the reference's params.json/variant.json).

The reference's remote modes (``local_docker``/``ec2``, instrument.py:455-500)
map onto :func:`make_launch_bundle`: a self-contained bundle directory with
the spec, a ``launch.sh`` (env setup + runner command + the reference's
periodic result sync and sync-on-termination, instrument.py
``periodic_sync``/``sync_log_on_termination``), and a ``docker_cmd.sh``
(``to_docker_command`` role). Bundles EXECUTE locally via :func:`run_bundle`;
docker/cloud execution is generation-only in this image (no docker binary,
no cloud reachability) — the bundle is exactly what a remote worker runs.

Usage:
    python -m imitation_from_observation_tpu.exp.run_experiment --spec spec.json
    python -m imitation_from_observation_tpu.exp.run_experiment \
        --launcher run_pipeline --task push --log-dir data/push --seed 1
    python -m imitation_from_observation_tpu.exp.run_experiment \
        --spec spec.json --mode bundle --bundle-dir data/bundles/exp1
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from typing import Any

from imitation_from_observation_tpu.core.config import ExperimentConfig
from imitation_from_observation_tpu.core.log import get_logger

LAUNCHERS = {
    "run_pipeline": "imitation_from_observation_tpu.exp.launchers:run_pipeline",
    "run_translation_training": "imitation_from_observation_tpu.exp.launchers:run_translation_training",
    "run_visual_trpo": "imitation_from_observation_tpu.exp.launchers:run_visual_trpo",
    "train_expert": "imitation_from_observation_tpu.exp.train_expert:train_expert",
    "generate_demo_videos": "imitation_from_observation_tpu.exp.gen_videos:generate_demo_videos",
    "smoke": "imitation_from_observation_tpu.exp.run_experiment:_smoke",
}


def _smoke(log_dir: str = "data/exp", **kwargs) -> str:
    """Trivial launcher: writes a marker file. Used to validate launch
    bundles end-to-end (a bundle's launch.sh really executes the runner)
    without paying for a training run."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, "smoke.json")
    with open(path, "w") as f:
        json.dump({"ok": True, "kwargs": {k: str(v) for k, v in kwargs.items()}}, f)
    return path


def _resolve(name: str):
    import importlib

    mod_name, fn_name = LAUNCHERS[name].split(":")
    return getattr(importlib.import_module(mod_name), fn_name)


def run_spec(spec: dict[str, Any]) -> Any:
    log_dir = spec.get("log_dir") or spec.get("kwargs", {}).get("log_dir", "data/exp")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "variant.json"), "w") as f:
        json.dump(spec, f, indent=2, default=str)
    log = get_logger(log_dir)
    log.log(f"running {spec['launcher']} in {log_dir}")
    fn = _resolve(spec["launcher"])
    return fn(**spec.get("kwargs", {}))


def run_local(spec: dict[str, Any]) -> int:
    """Run a spec in a fresh subprocess (the reference's mode='local')."""
    log_dir = spec.get("log_dir") or spec.get("kwargs", {}).get("log_dir", "data/exp")
    os.makedirs(log_dir, exist_ok=True)
    spec_path = os.path.join(log_dir, "spec.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f, default=str)
    return subprocess.call(
        [sys.executable, "-m", "imitation_from_observation_tpu.exp.run_experiment", "--spec", spec_path]
    )


def make_launch_bundle(
    spec: dict[str, Any],
    bundle_dir: str,
    *,
    docker_image: str = "imitation-from-observation-tpu:latest",
    env: dict[str, str] | None = None,
    sync_dest: str | None = None,
    periodic_sync_interval: int = 15,
    code_dir: str | None = None,
) -> dict[str, str]:
    """Generate a self-contained launch bundle (instrument.py:455-520 role).

    Writes into ``bundle_dir``:

    - ``spec.json`` — the typed task (the reference's base64-pickled
      ``args_data``, made inspectable)
    - ``launch.sh`` — env exports + the runner command; when ``sync_dest`` is
      set, a backgrounded periodic result sync plus a final sync on exit
      (``periodic_sync`` + ``sync_log_on_termination``)
    - ``docker_cmd.sh`` — the ``to_docker_command`` equivalent: mounts the
      code dir and runs the same ``launch.sh`` inside ``docker_image``
    - ``metadata.json`` — image/env/sync settings for the launcher that
      consumes the bundle

    Returns the path map. Execution: :func:`run_bundle` locally; the docker/
    cloud paths are generation-only in this image (no docker, no cloud).
    """
    import shlex

    os.makedirs(bundle_dir, exist_ok=True)
    code_dir = os.path.abspath(
        code_dir or os.path.join(os.path.dirname(__file__), "..", "..")
    )
    # pin the log dir to an ABSOLUTE path inside the spec: a relative one
    # would resolve against the worker's cwd at run time while the sync
    # block below resolves it against the generator's cwd — the runner and
    # the result sync would silently target different directories
    spec = json.loads(json.dumps(spec, default=str))  # private copy
    log_dir = spec.get("log_dir") or spec.get("kwargs", {}).get("log_dir", "data/exp")
    log_dir = os.path.abspath(log_dir)
    if "log_dir" in spec:
        spec["log_dir"] = log_dir
    if "log_dir" in spec.get("kwargs", {}):
        spec["kwargs"]["log_dir"] = log_dir
    spec_path = os.path.join(bundle_dir, "spec.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f, indent=2, default=str)

    env = dict(env or {})
    env.setdefault("PYTHONPATH", code_dir)
    # shlex.quote (single quotes): $, backticks, backslashes in values must
    # reach the process literally, not shell-expanded
    exports = "\n".join(
        f"export {k}={shlex.quote(str(v))}" for k, v in sorted(env.items())
    )
    run_cmd = (
        f"{shlex.quote(sys.executable)} -m imitation_from_observation_tpu.exp.run_experiment "
        f"--spec {shlex.quote(os.path.abspath(spec_path))}"
    )
    sync_block = ""
    if sync_dest:
        # periodic sync loop + final sync on termination; cp -ru is the
        # in-image stand-in for the reference's `aws s3 sync` (no rsync/aws)
        sync_block = f"""
SYNC_SRC={shlex.quote(log_dir)}
SYNC_DEST={shlex.quote(os.path.abspath(sync_dest))}
sync_results() {{ mkdir -p "$SYNC_DEST" && cp -ru "$SYNC_SRC/." "$SYNC_DEST/" 2>/dev/null || true; }}
( while sleep {int(periodic_sync_interval)}; do sync_results; done ) &
SYNC_PID=$!
trap 'kill $SYNC_PID 2>/dev/null; sync_results' EXIT
"""
    launch_path = os.path.join(bundle_dir, "launch.sh")
    with open(launch_path, "w") as f:
        f.write(f"""#!/bin/bash
# generated by make_launch_bundle — run_experiment_lite equivalent
set -u
{exports}
{sync_block}
{run_cmd}
""")
    os.chmod(launch_path, 0o755)

    docker_path = os.path.join(bundle_dir, "docker_cmd.sh")
    env_flags = " ".join(
        f"-e {k}={shlex.quote(str(v))}" for k, v in sorted(env.items())
    )
    with open(docker_path, "w") as f:
        f.write(f"""#!/bin/bash
# to_docker_command equivalent (instrument.py mode='local_docker'); this
# image has no docker binary — run on a host that does, or use launch.sh
docker run --rm -v {shlex.quote(code_dir)}:/code -w /code {env_flags} \\
  {docker_image} bash {shlex.quote(os.path.abspath(launch_path))}
""")
    os.chmod(docker_path, 0o755)

    meta_path = os.path.join(bundle_dir, "metadata.json")
    with open(meta_path, "w") as f:
        json.dump(
            dict(
                docker_image=docker_image,
                env=env,
                sync_dest=sync_dest,
                periodic_sync_interval=periodic_sync_interval,
                code_dir=code_dir,
                log_dir=log_dir,
            ),
            f,
            indent=2,
        )
    return dict(
        spec=spec_path, launch=launch_path, docker=docker_path, metadata=meta_path
    )


def run_bundle(bundle_dir: str) -> int:
    """Execute a bundle's launch.sh locally (the mode='local' execution of a
    generated bundle; a remote worker would run the same script)."""
    return subprocess.call(["bash", os.path.join(bundle_dir, "launch.sh")])


def run_bundles(
    root_dir: str, workers: int = 1, poll: float = 0.2
) -> dict[str, int]:
    """Drain every bundle under ``root_dir`` across N worker subprocesses.

    The scheduler half of the reference's ``batch_tasks`` + one-EC2-instance-
    per-variant fan-out (instrument.py:483-520): each direct child of
    ``root_dir`` containing a ``launch.sh`` is a unit of work; up to
    ``workers`` run concurrently, each in its own process (the same
    share-nothing isolation the reference got from separate machines — here
    separate hosts would each run ``run_bundle`` on their shard). Returns
    {bundle_name: returncode} and writes it to ``root_dir/results.json``.
    """
    import time

    if workers > 1 and os.environ.get("IFO_TPU_ALLOW_CONCURRENT") != "1":
        # two processes sharing this image's single TPU relay serialize and
        # corrupt each other's timings (CLAUDE.md); concurrent drain is for
        # multi-host/CPU fleets. Opt in explicitly when that's where you are.
        get_logger().log(
            f"run_bundles: clamping workers {workers} -> 1 (single shared "
            "TPU relay; set IFO_TPU_ALLOW_CONCURRENT=1 on a real fleet)"
        )
        workers = 1

    pending = sorted(
        d for d in os.listdir(root_dir)
        if os.path.isfile(os.path.join(root_dir, d, "launch.sh"))
    )
    running: dict[str, subprocess.Popen] = {}
    results: dict[str, int] = {}
    while pending or running:
        while pending and len(running) < max(1, workers):
            name = pending.pop(0)
            running[name] = subprocess.Popen(
                ["bash", os.path.join(root_dir, name, "launch.sh")]
            )
        for name, proc in list(running.items()):
            rc = proc.poll()
            if rc is not None:
                results[name] = rc
                del running[name]
        if running:
            time.sleep(poll)
    with open(os.path.join(root_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    return results


def make_fanout_bundles(
    base_spec: dict[str, Any],
    variants: list[dict[str, Any]],
    root_dir: str,
    **bundle_kwargs,
) -> list[dict[str, str]]:
    """Cluster scale-out artifacts: one launch bundle per variant.

    The reference fanned a ``VariantGenerator`` sweep over EC2 machines
    (instrument.py ``batch_tasks`` + ``launch_ec2``); here each variant
    becomes a self-contained bundle under ``root_dir/v<i>/`` — exactly what a
    cluster scheduler (or N workers running ``run_bundle``) consumes. Variant
    keys merge into the spec's kwargs; each variant gets its own log_dir and
    a ``variant.json`` alongside the spec.
    """
    out = []
    for i, variant in enumerate(variants):
        bdir = os.path.join(root_dir, f"v{i}")
        spec = json.loads(json.dumps(base_spec, default=str))  # deep copy
        kwargs = dict(spec.get("kwargs", {}), **variant)
        log_dir = os.path.join(
            spec.get("log_dir") or kwargs.get("log_dir", "data/exp"), f"v{i}"
        )
        kwargs["log_dir"] = log_dir
        spec.update(log_dir=log_dir, kwargs=kwargs)
        paths = make_launch_bundle(spec, bdir, **bundle_kwargs)
        with open(os.path.join(bdir, "variant.json"), "w") as f:
            json.dump(variant, f, indent=1, default=str)
        paths["variant"] = os.path.join(bdir, "variant.json")
        out.append(paths)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--spec", help="path to a json spec")
    p.add_argument("--launcher", choices=sorted(LAUNCHERS))
    p.add_argument("--task")
    p.add_argument("--log-dir", default="data/exp")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-demos", type=int, default=40)
    p.add_argument("--rl-iters", type=int, default=10)
    p.add_argument("--translation-iters", type=int, default=2000)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument(
        "--resume-from",
        help="policy checkpoint to restore before training (scripts/resume_training.py capability)",
    )
    p.add_argument(
        "--mode", choices=("inline", "bundle", "drain"), default="inline",
        help="inline: run the spec here; bundle: generate a launch bundle "
             "(instrument.py local_docker/ec2 role) without executing; "
             "drain: execute every bundle under --bundle-root across "
             "--workers processes (batch_tasks role)",
    )
    p.add_argument("--bundle-dir", help="output dir for --mode bundle")
    p.add_argument("--bundle-root", help="bundle tree for --mode drain")
    p.add_argument("--workers", type=int, default=1,
                   help="concurrent bundle processes for --mode drain")
    p.add_argument("--docker-image", default="imitation-from-observation-tpu:latest")
    p.add_argument("--sync-dest", help="periodic result-sync destination for the bundle")
    args = p.parse_args(argv)
    if args.mode == "drain":
        if not args.bundle_root:
            p.error("--mode drain needs --bundle-root")
        results = run_bundles(args.bundle_root, workers=args.workers)
        print(json.dumps(results, indent=1, sort_keys=True))
        if any(rc != 0 for rc in results.values()):
            sys.exit(1)
        return
    if args.spec:
        with open(args.spec) as f:
            spec = json.load(f)
    else:
        if not args.launcher:
            p.error("need --spec or --launcher")
        kwargs = dict(
            task=args.task,
            log_dir=args.log_dir,
            seed=args.seed,
            n_demos=args.n_demos,
            rl_iters=args.rl_iters,
            translation_iters=args.translation_iters,
            scale=args.scale,
        )
        if args.resume_from:
            kwargs["resume_from"] = args.resume_from
        spec = dict(launcher=args.launcher, log_dir=args.log_dir, kwargs=kwargs)
    if args.mode == "bundle":
        if not args.bundle_dir:
            p.error("--mode bundle needs --bundle-dir")
        paths = make_launch_bundle(
            spec, args.bundle_dir,
            docker_image=args.docker_image, sync_dest=args.sync_dest,
        )
        print(json.dumps(paths, indent=1))
        return
    run_spec(spec)


if __name__ == "__main__":
    main()
