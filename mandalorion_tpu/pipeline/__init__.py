"""APDFQ pipeline orchestration with the reference's stage-artifact
contract: every module reads its inputs from tmp/ files, so any suffix of
APDFQ can be re-run (the -M module string is the checkpoint system,
SURVEY §5.4)."""

from mandalorion_tpu.pipeline.stages import run_pipeline  # noqa: F401
