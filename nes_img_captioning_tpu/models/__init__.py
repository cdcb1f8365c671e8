"""Model families: parameter substrate + pure apply functions.

Registry mirrors the reference's ``Net`` enum
(reference: src/algorithm/policies.py:21-23).
"""

from .params import Leaf, ParamSpec
from .fc_caption import FCCaptionModel, FCModelOptions
from .mnist import MnistModel, MnistModelOptions

NETS = {
    "mnist": MnistModel,
    "fc_caption": FCCaptionModel,
}

__all__ = [
    "Leaf",
    "ParamSpec",
    "FCCaptionModel",
    "FCModelOptions",
    "MnistModel",
    "MnistModelOptions",
    "NETS",
]
