from raytracer_odin_tpu.cli import main

raise SystemExit(main())
