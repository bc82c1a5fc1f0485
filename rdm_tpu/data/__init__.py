from .datasets import (get_dataset, GTOHaloImageDataset,  # noqa: F401
                       GTOHaloTrajectoryDataset, GTO_MEAN, GTO_STD,
                       make_synthetic_gto_pkl)
