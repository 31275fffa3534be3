from artspeech_tpu.train.checkpoint import (
    load_params,
    restore_checkpoint,
    save_checkpoint,
    save_params,
)
from artspeech_tpu.train.state import (
    EarlyStopping,
    PlateauScheduler,
    TrainState,
    count_parameters,
    create_train_state,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)
from artspeech_tpu.train.step import (
    make_artspeech_eval_step,
    make_artspeech_train_step,
)
from artspeech_tpu.train.loop import (
    FitResult,
    fit,
    run_eval_epoch,
    run_train_epoch,
)
from artspeech_tpu.train.recognition_step import (
    cyclic_triangular_schedule,
    make_recognition_eval_step,
    make_recognition_train_step,
)
from artspeech_tpu.train.pc_step import (
    make_autoencoder_eval_step,
    make_autoencoder_train_step,
    make_latent_rnn_eval_step,
    make_latent_rnn_train_step,
    reconstruction_p2cp_mm,
)
from artspeech_tpu.train.step import (
    make_transformer_eval_step,
    make_transformer_train_step,
    shift_targets_right,
)
