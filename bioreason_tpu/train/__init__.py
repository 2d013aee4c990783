from bioreason_tpu.train.lora import attach_lora, merge_lora, strip_lora, lora_zero_like
from bioreason_tpu.train.trainable import make_partition, combine, split
from bioreason_tpu.train.optim import make_optimizer, cosine_warmup_schedule
