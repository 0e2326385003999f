from cosa_tpu.data.loader import build_train_loader, build_val_dataset  # noqa: F401
