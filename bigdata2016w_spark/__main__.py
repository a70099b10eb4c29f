from bigdata2016w_spark.cli import main

raise SystemExit(main())
