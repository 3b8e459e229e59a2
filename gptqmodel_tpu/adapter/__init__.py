from gptqmodel_tpu.adapter.peft import (  # noqa: F401
    attach_lora,
    collect_lora,
    lora_train,
    set_lora,
)
