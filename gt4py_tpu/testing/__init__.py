from .suites import (  # noqa: F401
    StencilTestSuite,
    field,
    global_name,
    none,
    parameter,
)
