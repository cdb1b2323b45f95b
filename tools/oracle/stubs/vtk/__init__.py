__all__ = []
def __getattr__(name):
    class _Stub:
        def __init__(self, *a, **k): pass
        def __call__(self, *a, **k): return self
        def __getattr__(self, n): return self
    _Stub.__name__ = name
    return _Stub
