from ragmeup_tpu.train.train import (
    TrainState, make_decoder_train_step, make_encoder_train_step,
    decoder_loss, contrastive_loss,
)

__all__ = ["TrainState", "make_decoder_train_step", "make_encoder_train_step",
           "decoder_loss", "contrastive_loss"]
