from umnn_tpu.data.toy import TOY_DATASETS, inf_train_gen

__all__ = ["TOY_DATASETS", "inf_train_gen"]
