"""Algorithm cores: NIC-NES and NIC-ES engines + shared bookkeeping tools
(reference layer L5/L6: src/algorithm/nic_nes/, src/algorithm/nic_es/,
src/algorithm/tools/)."""

from .iteration import Iteration
from .podium import Podium
from .statistics import Statistics
from .snapshot import save_snapshot
from .optimizers import SGD, Adam, make_optimizer

__all__ = [
    "Iteration",
    "Podium",
    "Statistics",
    "save_snapshot",
    "SGD",
    "Adam",
    "make_optimizer",
]
