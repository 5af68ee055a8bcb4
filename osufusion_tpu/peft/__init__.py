from osufusion_tpu.peft.lora import (
    LoraConfig,
    apply_lora,
    count_lora_params,
    init_lora,
    merge_lora,
)

__all__ = ["LoraConfig", "init_lora", "apply_lora", "merge_lora", "count_lora_params"]
