# Column-level helpers; import modules directly (functions.texts, functions.vectors).
