from clickhouse_mysql_data_reader_spark.cli import main

raise SystemExit(main())
