from .flagship import flagship  # noqa: F401
