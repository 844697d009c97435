from .flagship import (  # noqa: F401
    FLAGSHIP_ROUTES,
    FLAGSHIP_STATEMENTS,
    build_flagship,
    flagship_sink_counts,
    run_flagship,
)
