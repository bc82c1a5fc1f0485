from .cr3bp import (CR3BP_MU, l1_position, jacobi_energy,  # noqa: F401
                    coe2rv, get_gto_state_cr3bp, propagate, spiral_to_boundary)
from .oracle import (CR3BPEarthMissionWarmstartSimulatorBoundary,  # noqa: F401
                     PYDYLAN_AVAILABLE)
