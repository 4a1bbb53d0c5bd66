from t48.cli.main import main

raise SystemExit(main())
