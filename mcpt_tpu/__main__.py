from mcpt_tpu.cli import main

raise SystemExit(main())
