from artspeech_tpu.eval.articulation import (
    inject_upper_incisor,
    make_test_step,
    per_sentence_metrics,
    run_test,
)
from artspeech_tpu.eval.artifacts import (
    save_contours,
    save_tract_variables_csv,
    tvs_to_records,
)
