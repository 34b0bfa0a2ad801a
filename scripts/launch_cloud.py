#!/usr/bin/env python
"""Cloud TPU pod-slice orchestration (the reference's SageMaker layer).

Role parity with /root/reference/sagemaker/{fsx,fastfile}.ipynb +
sagemaker/code/start.py + sagemaker/code/torch_launch.sh: the reference
provisions a multi-node GPU cluster through a SageMaker PyTorch Estimator,
wires torchrun rank/master plumbing from SM_HOSTS, stages ERA5 data through
an FSx (local-disk) or FastFile (streamed) channel, launches
finetune_fully.py on every node, and tears the cluster down.

The TPU-native equivalent needs none of the rank plumbing: on a Cloud TPU
pod slice every host runs the SAME command and jax.distributed discovers
the coordinator from the TPU metadata environment (see
pangu_tpu/parallel/mesh.py::distributed_init). What remains is genuine
orchestration, which this script does with plain gcloud:

  create  provision the slice (queued-resources with --spot support, or
          a direct tpu-vm create)
  stage   push the repo to every worker + stage ERA5 data from GCS —
          --data-mode copy  = gsutil rsync to local disk (FSx analogue)
          --data-mode stream= gcsfuse mount, read on demand (FastFile
          analogue)
  run     scripts/launch_pod.sh <entry> on --worker=all
  logs    tail the entry log on worker 0
  delete  tear the slice down
  all     create -> stage -> run

Every gcloud/gsutil invocation is built as an argv list and printed before
execution; --dry-run prints the full plan without executing anything (and
is how tests/test_scripts_cli.py exercises this file offline).

Example (the reference fsx.ipynb workflow, TPU edition):

  python scripts/launch_cloud.py all --tpu-name pangu-ft --zone us-central2-b \
      --accelerator-type v5litepod-16 --data-bucket gs://my-era5/npy \
      --entry finetune -- --set train.epochs=20 --weights params_24.npz
"""

import argparse
import os
import shlex
import subprocess
import sys
from typing import List, Sequence

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REMOTE_DIR = "~/pangu_tpu"
REMOTE_DATA = "/home/$(whoami)/era5_data"
MOUNT_POINT = "/mnt/era5"


def _ssh_all(tpu: str, zone: str, remote_cmd: str) -> List[str]:
    return ["gcloud", "compute", "tpus", "tpu-vm", "ssh", tpu,
            f"--zone={zone}", "--worker=all", "--command", remote_cmd]


def plan(args: argparse.Namespace, extra: Sequence[str]) -> List[List[str]]:
    """Build the ordered argv list for the requested action (pure; tested)."""
    cmds: List[List[str]] = []
    tpu, zone = args.tpu_name, args.zone

    def do_create() -> None:
        if args.queued:
            cmd = ["gcloud", "compute", "tpus", "queued-resources", "create",
                   tpu, f"--node-id={tpu}", f"--zone={zone}",
                   f"--accelerator-type={args.accelerator_type}",
                   f"--runtime-version={args.runtime_version}"]
            if args.spot:
                cmd.append("--spot")
        else:
            cmd = ["gcloud", "compute", "tpus", "tpu-vm", "create", tpu,
                   f"--zone={zone}",
                   f"--accelerator-type={args.accelerator_type}",
                   f"--version={args.runtime_version}"]
            if args.spot:
                cmd.append("--spot")
        cmds.append(cmd)

    def do_stage() -> None:
        # Code: tar the repo locally, scp to all workers, unpack. (scp of a
        # single tarball is far faster than a recursive copy of the tree.)
        tarball = "/tmp/pangu_tpu_repo.tar.gz"
        cmds.append(["tar", "-C", REPO_ROOT, "-czf", tarball,
                     "--exclude=.git", "--exclude=.jax_cache",
                     "--exclude=__pycache__", "."])
        cmds.append(["gcloud", "compute", "tpus", "tpu-vm", "scp", tarball,
                     f"{tpu}:/tmp/", f"--zone={zone}", "--worker=all"])
        cmds.append(_ssh_all(
            tpu, zone,
            f"mkdir -p {REMOTE_DIR} && tar -C {REMOTE_DIR} -xzf {tarball}"))
        # Data: GCS plays the role of the reference's S3/FSx source.
        if args.data_bucket:
            if args.data_mode == "copy":   # FSx analogue: local-disk copy
                cmds.append(_ssh_all(
                    tpu, zone,
                    f"mkdir -p {REMOTE_DATA} && "
                    f"gsutil -m rsync -r {args.data_bucket} {REMOTE_DATA}"))
            else:                          # FastFile analogue: stream on read
                # gcsfuse mounts a bucket, not a bucket/prefix; a prefix in
                # --data-bucket becomes --only-dir.
                bucket, _, prefix = (
                    args.data_bucket.removeprefix("gs://").partition("/"))
                only_dir = f"--only-dir {prefix} " if prefix else ""
                cmds.append(_ssh_all(
                    tpu, zone,
                    f"sudo mkdir -p {MOUNT_POINT} && "
                    f"(mountpoint -q {MOUNT_POINT} || sudo gcsfuse "
                    f"--implicit-dirs -o allow_other {only_dir}"
                    f"{bucket} {MOUNT_POINT})"))

    def do_run() -> None:
        data_root = (REMOTE_DATA if args.data_mode == "copy" else MOUNT_POINT)
        entry_args = list(extra)
        if args.data_bucket and not any("data.root" in a for a in entry_args):
            entry_args = [f"--set data.root={data_root}"] + entry_args
        joined = " ".join(entry_args)
        cmds.append(_ssh_all(
            tpu, zone,
            f"cd {REMOTE_DIR} && nohup bash scripts/launch_pod.sh "
            f"{args.entry} {joined} > {args.entry}.out 2>&1 &"))

    def do_logs() -> None:
        cmds.append(["gcloud", "compute", "tpus", "tpu-vm", "ssh", tpu,
                     f"--zone={zone}", "--worker=0", "--command",
                     f"tail -n 100 -f {REMOTE_DIR}/{args.entry}.out"])

    def do_delete() -> None:
        if args.queued:
            cmds.append(["gcloud", "compute", "tpus", "queued-resources",
                         "delete", tpu, f"--zone={zone}", "--force", "--quiet"])
        else:
            cmds.append(["gcloud", "compute", "tpus", "tpu-vm", "delete",
                         tpu, f"--zone={zone}", "--quiet"])

    steps = {"create": [do_create], "stage": [do_stage], "run": [do_run],
             "logs": [do_logs], "delete": [do_delete],
             "all": [do_create, do_stage, do_run]}
    for step in steps[args.action]:
        step()
    return cmds


def main(argv: Sequence[str] = None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("action",
                   choices=["create", "stage", "run", "logs", "delete", "all"])
    p.add_argument("--tpu-name", required=True)
    p.add_argument("--zone", default="us-central2-b")
    p.add_argument("--accelerator-type", default="v5litepod-16")
    p.add_argument("--runtime-version", default="v2-alpha-tpuv5-lite")
    p.add_argument("--queued", action="store_true",
                   help="provision via queued-resources instead of tpu-vm create")
    p.add_argument("--spot", action="store_true")
    p.add_argument("--data-bucket", default=None,
                   help="gs:// prefix holding converted ERA5 npy data")
    p.add_argument("--data-mode", choices=["copy", "stream"], default="copy",
                   help="copy=gsutil rsync to local disk (FSx analogue); "
                        "stream=gcsfuse mount (FastFile analogue)")
    p.add_argument("--entry", default="finetune",
                   choices=["finetune", "lora_tune", "test", "rollout"])
    p.add_argument("--dry-run", action="store_true",
                   help="print the gcloud plan without executing")
    args, extra = p.parse_known_args(argv)
    if extra and extra[0] == "--":
        extra = extra[1:]

    cmds = plan(args, extra)
    for cmd in cmds:
        print("+ " + " ".join(shlex.quote(c) for c in cmd))
        if args.dry_run:
            continue
        rc = subprocess.call(cmd)
        if rc != 0:
            print(f"launch_cloud: step failed (rc={rc}); stopping",
                  file=sys.stderr)
            return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
