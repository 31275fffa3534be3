from artspeech_tpu.geometry.area_function import (
    area_function,
    evenly_spaced_fx,
    intersect_semipolar_grid,
    tube_area_function,
)
from artspeech_tpu.geometry.grid import build_semipolar_grid, default_semipolar_grid
from artspeech_tpu.geometry.tract_variables import (
    ART_SLICES,
    compute_tract_variables,
    tract_variables_from_stack,
)
from artspeech_tpu.geometry.tube import (
    EXTERNAL_WALL_ORDER,
    INTERNAL_WALL_ORDER,
    generate_vocal_tract_tube,
    generate_vocal_tract_tube_batch,
)
