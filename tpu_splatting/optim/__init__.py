from .fractional import (FractionalAdam, FractionalLaProp, FractionalOpt,
                         FractionalState, GroupConfig, SparseAdam,
                         SparseLaProp, VisibilityAwareAdam,
                         VisibilityAwareLaProp, VisibilityOptimizer)
from .parameter_class import ParameterClass

__all__ = [
    "GroupConfig", "FractionalOpt", "FractionalState", "FractionalAdam",
    "FractionalLaProp", "SparseAdam", "SparseLaProp", "VisibilityOptimizer",
    "VisibilityAwareAdam", "VisibilityAwareLaProp", "ParameterClass",
]
