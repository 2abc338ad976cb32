"""`python -m vid2player3d_tpu --cfg <name> [...]` — see `cli.run`."""

from vid2player3d_tpu.cli.run import main

raise SystemExit(main())
