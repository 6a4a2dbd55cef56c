from aurora_tpu.cli import main

raise SystemExit(main())
