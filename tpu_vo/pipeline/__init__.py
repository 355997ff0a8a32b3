from tpu_vo.pipeline.step import VOState, VOStepOutput, vo_step, initial_state
from tpu_vo.pipeline.runner import run_sequence_scan, run_sequence_batched

__all__ = [
    "VOState",
    "VOStepOutput",
    "vo_step",
    "initial_state",
    "run_sequence_scan",
    "run_sequence_batched",
]
