from tpusplat.train.losses import l1_loss, ssim, gs_loss
from tpusplat.train.step import TrainState, create_train_state, train_step

__all__ = ["l1_loss", "ssim", "gs_loss", "TrainState", "create_train_state", "train_step"]
