// ReferenceTableList - mirror of pages/ReferenceTableList.tsx: table of
// all reference tables with webhook chips, a data preview dialog, and a
// confirm-delete dialog.  The preview queries the REAL table through the
// /query gateway instead of the reference UI's mock random rows.

import {
  h, pageHeader, spinner, snackbar, navigate, dataTable, dialog,
  confirmDialog, fmtDate,
} from "/assets/ui.js";
import { referenceTableApi, webhookApi, queryApi } from "/assets/api.js";

export async function ReferenceTableList(main) {
  main.append(
    pageHeader({
      title: "Reference Tables",
      buttonText: "Upload New Table",
      buttonPath: "/reference-tables/upload",
    }),
    spinner(),
  );

  let tables = [], webhooks = [];
  try {
    [tables, webhooks] = await Promise.all([
      referenceTableApi.getAll(),
      webhookApi.getAll().catch(() => []),
    ]);
  } catch (e) {
    main.lastChild.replaceWith(
      h("p", { style: "color:var(--error)" }, `Error loading reference tables: ${e.message}`),
    );
    return;
  }

  const refetch = () => {
    main.replaceChildren();
    ReferenceTableList(main);
  };

  const webhookName = (wid) => webhooks.find((w) => w.id === wid)?.source_path || "Unknown";

  const openPreview = async (table) => {
    // same naming the backend registers: dashes in the webhook id become
    // underscores (engine/reference_tables.py::ref_table_name)
    const fq = `ref_${String(table.webhook_id).replace(/-/g, "_")}_${table.name ?? table.table_name}`;
    let content;
    try {
      const res = await queryApi.executeQuery(`SELECT * FROM ${fq} LIMIT 5`);
      content = dataTable({
        columns: (res.columns || []).map((c) => ({ id: c, label: c })),
        rows: (res.result ?? res.rows ?? []).map((r) => {
          const o = {};
          (res.columns || []).forEach((c, i) => (o[c] = r[i]));
          return o;
        }),
      });
    } catch (e) {
      content = h("div", { class: "alert error" }, `Preview failed: ${e.message}`);
    }
    dialog({
      title: `Table Preview: ${table.name ?? table.table_name}`,
      content: h("div", {}, h("p", { class: "muted" }, "Showing sample data from the reference table."), content),
      actions: (close) => [h("button", { onclick: close }, "Close")],
    });
  };

  const handleDelete = (table) => {
    confirmDialog(
      `Are you sure you want to delete the reference table "${table.name ?? table.table_name}"? This action cannot be undone.`,
      async () => {
        try {
          await referenceTableApi.delete(table.id);
          snackbar("Reference table deleted successfully", "success");
          refetch();
        } catch (e) {
          snackbar(`Failed to delete reference table: ${e.message}`, "error");
        }
      },
    );
  };

  const body = tables.length
    ? dataTable({
        columns: [
          { id: "name", label: "Table Name" },
          {
            id: "webhook",
            label: "Webhook",
            format: (wid) =>
              h(
                "span",
                { class: "chip outlined clickable", onclick: () => navigate(`/webhooks/${wid}`) },
                webhookName(wid),
              ),
          },
          { id: "description", label: "Description" },
          { id: "created_at", label: "Created At", format: fmtDate },
          {
            id: "actions",
            label: "Actions",
            align: "right",
            format: (t) =>
              h(
                "span",
                {},
                h("button", { class: "iconbtn", title: "Preview data", onclick: () => openPreview(t) }, "👁"),
                h("button", { class: "iconbtn error", title: "Delete table", onclick: () => handleDelete(t) }, "🗑"),
              ),
          },
        ],
        rows: tables.map((t) => ({
          name: t.name ?? t.table_name,
          webhook: t.webhook_id,
          description: t.description,
          created_at: t.created_at,
          actions: t,
        })),
      })
    : h("div", { class: "card center" }, 'No reference tables found. Click "Upload New Table" to create one.');

  main.lastChild.replaceWith(body);
}
