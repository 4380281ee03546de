from probe_ray.cli import main

raise SystemExit(main())
