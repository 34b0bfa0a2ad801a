from pangu_tpu.model.pangu import PanguModel  # noqa: F401
