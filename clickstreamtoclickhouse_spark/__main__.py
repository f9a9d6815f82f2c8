"""`python -m clickstreamtoclickhouse_spark` shim (reference:
seghouse/__main__.py)."""

from .app import main

raise SystemExit(main())
