from keymorph_tpu.training.config import Config  # noqa: F401
from keymorph_tpu.training.train import make_train_step, run_train  # noqa: F401
from keymorph_tpu.training.pretrain import make_pretrain_step, run_pretrain  # noqa: F401
from keymorph_tpu.training import checkpoint  # noqa: F401
