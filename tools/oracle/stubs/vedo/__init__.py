class _StubBase:
    def __init__(self, *a, **k): pass
    def __call__(self, *a, **k): return self
    def __getattr__(self, n): return self

__all__ = ["Mesh", "Plotter", "Points", "Arrow", "Arrows", "Sphere", "Line",
           "Text2D", "Axes", "Box", "Grid", "show", "settings", "Video"]

def __getattr__(name):
    t = type(name, (_StubBase,), {})
    return t

# the real vedo's star-import exposes numpy math names, which the
# reference's utils.py relies on (bare cos/sin/tan in R_tf)
from numpy import sin, cos, tan, pi, sqrt  # noqa: F401,E402
__all__ += ["sin", "cos", "tan", "pi", "sqrt"]
