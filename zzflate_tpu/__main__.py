from zzflate_tpu.cli import main

raise SystemExit(main())
