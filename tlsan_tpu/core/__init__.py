from tlsan_tpu.core.config import (
    DataCounts,
    ModelConfig,
    TrainConfig,
    load_config_json,
    save_config_json,
)
