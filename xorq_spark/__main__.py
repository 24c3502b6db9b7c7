from xorq_spark.cli import main

raise SystemExit(main())
