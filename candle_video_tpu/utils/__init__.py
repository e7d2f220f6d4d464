from .rng import Pcg32

__all__ = ["Pcg32"]
