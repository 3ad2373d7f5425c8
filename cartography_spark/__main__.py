from cartography_spark.cli import main

raise SystemExit(main())
