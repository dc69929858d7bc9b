"""Shared type aliases (parity: reference nerfies/types.py:15-27)."""

import pathlib
from typing import Any, Callable, Tuple, Union

PRNGKey = Any
Shape = Tuple[int, ...]
Dtype = Any
Array = Any

Activation = Callable[[Array], Array]
Initializer = Callable[[PRNGKey, Shape, Dtype], Array]

PathType = Union[str, pathlib.PurePosixPath]
