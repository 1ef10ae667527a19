"""L4 — experiment orchestration: search spaces, grid runner, CLI."""

from dmel_tpu.experiments.configs import (  # noqa: F401
    grid_search,
    expand_grid,
    get_search_space,
    esc50,
    audio_mnist,
    time_frequency,
    fsd,
)
from dmel_tpu.experiments.runner import (  # noqa: F401
    run_trial,
    run_sweep,
    run_sweep_packed,
    collect_results,
    load_results,
    get_config_by_row,
)
