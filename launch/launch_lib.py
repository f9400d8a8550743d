"""Shared launcher generation: TPU VM (gcloud) or SLURM job scripts.

Role-parity target: /root/reference/slurm-scripts/ - small Python generators
that emit + submit job scripts. The reference's jobs are torchrun/NCCL 8-GPU
rendezvous; here a job is a single-controller JAX program on a TPU VM (all
chips of the slice belong to one process via the mesh), so the launcher is a
one-liner ssh/srun around the same CLI scripts.
"""

from __future__ import annotations

import os
import shlex
import subprocess


def build_command(script: str, script_args: list[str], env: dict[str, str]) -> str:
    exports = "".join(f"export {k}={shlex.quote(v)}\n" for k, v in env.items())
    args = " ".join(shlex.quote(a) for a in script_args)
    return f"{exports}cd $EILEV_TPU_REPO && python {script} {args}\n"


def tpu_vm_script(
    name: str,
    command: str,
    *,
    tpu_name: str,
    zone: str,
    project: str | None = None,
    worker: str = "all",
) -> str:
    """A bash script that runs the job on an existing TPU VM via gcloud ssh."""
    proj = f"--project={project} " if project else ""
    return f"""#!/bin/bash
# launch {name} on TPU VM {tpu_name} ({zone})
set -euo pipefail
gcloud compute tpus tpu-vm ssh {tpu_name} --zone={zone} {proj}--worker={worker} \\
  --command={shlex.quote(command)}
"""


def slurm_script(
    name: str,
    command: str,
    *,
    account: str,
    partition: str,
    time: str,
    mem: str = "64G",
    email: str | None = None,
) -> str:
    email_lines = (
        f"#SBATCH --mail-user={email}\n#SBATCH --mail-type=BEGIN,END\n" if email else ""
    )
    return f"""#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --account={account}
#SBATCH --partition={partition}
#SBATCH --time={time}
#SBATCH --mem={mem}
#SBATCH --nodes=1
#SBATCH --output=%x-%j.log
{email_lines}
{command}"""


def emit_or_submit(script_text: str, name: str, *, backend: str, dry_run: bool) -> None:
    fname = f"{name}.sh"
    with open(fname, "w") as f:
        f.write(script_text)
    os.chmod(fname, 0o755)
    print(f"wrote {fname}")
    if dry_run:
        print(script_text)
        return
    if backend == "slurm":
        subprocess.run(["sbatch", fname], check=True)
    else:
        subprocess.run(["bash", fname], check=True)


def add_common_args(parser) -> None:
    parser.add_argument("--backend", choices=["tpu-vm", "slurm"], default="tpu-vm")
    # tpu-vm backend
    parser.add_argument("--tpu_name", default=os.environ.get("TPU_NAME", ""))
    parser.add_argument("--zone", default=os.environ.get("TPU_ZONE", ""))
    parser.add_argument("--project", default=None)
    # slurm backend
    parser.add_argument("--account", default="")
    parser.add_argument("--partition", default="")
    parser.add_argument("--time", default="2-00:00:00")
    parser.add_argument("--mem", default="64G")
    parser.add_argument("--email", default=None)
    parser.add_argument("--repo_path", default="~/eilev-tpu", help="repo checkout on the worker")
    parser.add_argument("--wandb_project", default=None)
    parser.add_argument("--dry_run", action="store_true")


def finish(args, name: str, script: str, script_args: list[str], *, forward_wandb: bool = True) -> None:
    env = {"EILEV_TPU_REPO": args.repo_path}
    if args.wandb_project:
        env["WANDB_PROJECT"] = args.wandb_project
        if forward_wandb:  # baseline CLIs don't take the flag; env still set
            script_args = script_args + ["--wandb_project", args.wandb_project]
    command = build_command(script, script_args, env)
    if args.backend == "slurm":
        text = slurm_script(
            name, command, account=args.account, partition=args.partition,
            time=args.time, mem=args.mem, email=args.email,
        )
    else:
        text = tpu_vm_script(
            name, command, tpu_name=args.tpu_name, zone=args.zone, project=args.project
        )
    emit_or_submit(text, name, backend=args.backend, dry_run=args.dry_run)
