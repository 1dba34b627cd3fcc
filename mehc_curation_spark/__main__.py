from mehc_curation_spark.cli import main

raise SystemExit(main())
