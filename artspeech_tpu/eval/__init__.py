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
from artspeech_tpu.eval.decoders import (
    beam_ctc_decode,
    beam_ctc_decode_device,
    decode_to_strings,
    greedy_ctc_decode,
)
from artspeech_tpu.eval.recognition import run_recognition_test
from artspeech_tpu.eval.recognition_metrics import (
    edit_distance,
    substitution_matrix,
    word_error_rate,
    word_information_lost,
)
from artspeech_tpu.eval.autoencoder import (
    nomograms,
    run_autoencoder_test,
    run_latent_rnn_test,
)
from artspeech_tpu.eval.report import build_report, tv_correlation_report
