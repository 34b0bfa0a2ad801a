from pangu_tpu.data.dataset import (  # noqa: F401
    BatchLoader,
    Era5Dataset,
    NetCDFStore,
    NpyStore,
    PtStore,
    SyntheticStore,
    make_loader,
)
