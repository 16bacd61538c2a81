from .optim import (linear_warmup_cosine, linear_warmup_step, make_adamw,
                    make_optimizer)
from .steps import (lora_loss_fn, make_lora_train_step,
                    make_stage1_raw_train_step, make_stage1_train_step,
                    TrainState)

__all__ = ["linear_warmup_cosine", "linear_warmup_step", "make_adamw",
           "make_optimizer", "lora_loss_fn", "make_lora_train_step",
           "make_stage1_train_step", "make_stage1_raw_train_step",
           "TrainState"]
