#!/usr/bin/env python
"""Canned evaluation submission — equivalent of the reference's
`submit_test.py`: builds and runs the canonical 4-rate-point sweep command.

Model/dataset locations come from a JSON job config (see
lssvc_tpu/harness/jobs.py) instead of hard-coded cluster paths:

    python submit_test.py --job-config my_job.json [--dry-run]
"""

import argparse

from lssvc_tpu.harness.jobs import JobConfig, build_test_command, run_commands


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--job-config", type=str, required=True)
    parser.add_argument("--intra-period", type=int, default=-1)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    cfg = JobConfig.from_json(args.job_config)
    command = build_test_command(cfg, force_intra_period=args.intra_period)
    run_commands([command], dry_run=args.dry_run)


if __name__ == "__main__":
    main()
