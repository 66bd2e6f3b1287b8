from .batch_bo import (
    thompson_sampling,
    decoupled_thompson_sampling,
    dpp_ts,
    gibbon,
    hallucination,
    local_penalisation,
    TurboState,
    update_turbo_state,
    turbo,
    sober_ts,
    maximize_acqf,
    expected_improvement,
)

__all__ = [
    "thompson_sampling",
    "decoupled_thompson_sampling",
    "dpp_ts",
    "gibbon",
    "hallucination",
    "local_penalisation",
    "TurboState",
    "update_turbo_state",
    "turbo",
    "sober_ts",
    "maximize_acqf",
    "expected_improvement",
]
