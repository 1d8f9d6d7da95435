from hairgs_tpu.train.trainer import (
    make_gaussian_train_step,
    make_hair_train_step,
    gaussian_lr_tree,
    hair_lr_tree,
)
