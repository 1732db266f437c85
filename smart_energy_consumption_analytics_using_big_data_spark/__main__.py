from smart_energy_consumption_analytics_using_big_data_spark.cli import main

raise SystemExit(main())
