select * from `comscore-data-prod.ati.360_graden_rapportage_vertaaltabel_upload_20_21`
