"""Data shim: attribute bag (reference data/dataset.py:266)."""


class Data:
    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __repr__(self):
        keys = ", ".join(sorted(self.__dict__))
        return f"Data({keys})"
